from . import box_np_ops, geometry  # noqa: F401

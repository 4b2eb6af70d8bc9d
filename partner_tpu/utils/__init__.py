from . import flops  # noqa: F401

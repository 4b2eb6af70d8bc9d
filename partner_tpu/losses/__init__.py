from . import centernet, matcher, set_crit  # noqa: F401

from . import seg_metrics  # noqa: F401

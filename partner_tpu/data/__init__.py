from .registry import DATASETS, PIPELINES, Compose, build_dataset  # noqa: F401
from . import augment, collate, datasets, gt_aug, pipeline  # noqa: F401
from .loader import build_dataloader  # noqa: F401

from .registry import (  # noqa: F401
    BACKBONES, BBOX_HEADS, DETECTORS, LOSSES, NECKS, READERS, SEG_HEADS,
    Registry, build_from_cfg,
)
from . import backbone, backbone_dense, center_head, detectors, e2e_head, pillar, readers, rpn  # noqa: F401
from . import cswin, polarstream, rpn_stream, strobe, two_stage, seg_head, set_transformer, sparse, swin_vote  # noqa: F401


def build_detector(cfg, train_cfg=None, test_cfg=None, **kwargs):
    """det3d-compatible entry (models/builder.py:52)."""
    return build_from_cfg(cfg, DETECTORS,
                          dict(train_cfg=train_cfg, test_cfg=test_cfg,
                               **kwargs))

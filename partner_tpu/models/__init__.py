from .registry import (  # noqa: F401
    BACKBONES, BBOX_HEADS, DETECTORS, LOSSES, NECKS, READERS, SEG_HEADS,
    Registry, build_from_cfg,
)
from . import backbone, backbone_dense, center_head, detectors, e2e_head, pillar, readers, rpn  # noqa: F401
from . import cswin, polarstream, rpn_stream, strobe, two_stage, seg_head, set_transformer, sparse, swin_vote  # noqa: F401


def _inject_voxel_generator(cfg, vg):
    """Thread the config's top-level voxel_generator into head cfgs that
    lack one. The REFERENCE's configs keep the grid spec only at module
    level (its torch model needs no static grid at build time); our
    builders derive static shapes from it, and our own configs embed it in
    the head. This keeps unedited reference configs buildable."""
    cfg = dict(cfg)
    for key in ("bbox_head", "seg_head"):
        sub = cfg.get(key)
        if isinstance(sub, dict) and "voxel_generator" not in sub:
            sub = dict(sub)
            sub["voxel_generator"] = dict(vg)
            cfg[key] = sub
    if isinstance(cfg.get("first_stage_cfg"), dict):  # two-stage nesting
        cfg["first_stage_cfg"] = _inject_voxel_generator(
            cfg["first_stage_cfg"], vg)
    return cfg


def build_detector(cfg, train_cfg=None, test_cfg=None, voxel_generator=None,
                   **kwargs):
    """det3d-compatible entry (models/builder.py:52).

    ``voxel_generator``: optional top-level grid spec, injected into head
    cfgs missing one (reference-config compatibility, SURVEY 5.6)."""
    if voxel_generator is not None:
        cfg = _inject_voxel_generator(cfg, voxel_generator)
    return build_from_cfg(cfg, DETECTORS,
                          dict(train_cfg=train_cfg, test_cfg=test_cfg,
                               **kwargs))

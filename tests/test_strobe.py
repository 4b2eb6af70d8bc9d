"""STROBE multi-sweep and PointPillarsLSTM sector-streaming detectors.

Covers the reference detectors strobe_uber.py:12-673 and
streaming_waymo.py:11-313 in their polar-native forms (models/strobe.py).
"""

import numpy as np
import pytest

from partner_tpu import testing
from partner_tpu.core import box_np_ops

TINY_PR = testing.TINY_PR
GRID = (64, 128, 24)


def _pillar_parts(neck_type="RPNUber"):
    vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
          (TINY_PR[4] - TINY_PR[1]) / GRID[1],
          TINY_PR[5] - TINY_PR[2]]
    vg = dict(range=TINY_PR, voxel_size=vs, nsectors=1,
              max_voxel_num=[4096, 4096], voxel_shape="cylinder")
    reader = dict(type="DynamicPFNet", num_input_features=4,
                  num_filters=(32,), raz_cluster=True, ra_center=True)
    neck = dict(type=neck_type, layer_nums=[2, 2],
                ds_layer_strides=[2, 2], ds_num_filters=[32, 64],
                us_layer_strides=[1, 2], us_num_filters=[32, 32],
                num_input_features=32)
    bbox_head = dict(
        type="CenterHeadSingle",
        in_channels=64,
        tasks=[dict(num_class=1, class_names=["car"])],
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2)},
        dataset="nuscenes", weight=0.25, code_weights=[1.0] * 8,
        voxel_generator=vg, out_size_factor=2,
    )
    return reader, neck, bbox_head


def _sweep_points(rng, b=1, s=2, n=1200, cap=2048):
    import jax.numpy as jnp

    pts = np.zeros((b, s, cap, 4), np.float32)
    msk = np.zeros((b, s, cap), bool)
    for bi in range(b):
        for si in range(s):
            _, cart = testing.synthetic_polar_scene(rng, TINY_PR, n,
                                                    n_boxes=2)
            polar = box_np_ops.transform_points(cart[:, :3], "cylinder")
            polar = np.concatenate([polar, cart[:, 3:4]], 1)[:, :4]
            k = min(len(polar), cap)
            pts[bi, si, :k] = polar[:k]
            msk[bi, si, :k] = True
    return jnp.asarray(pts), jnp.asarray(msk)


@pytest.mark.parametrize("det_type", ["STROBE", "STROBEV2", "STROBEV3"])
def test_strobe_forward_predict(rng, det_type):
    import jax
    import jax.numpy as jnp

    from partner_tpu.models import build_detector

    reader, neck, bbox_head = _pillar_parts("RPNUber")
    cfg = dict(type=det_type, reader=reader, neck=neck, bbox_head=bbox_head,
               max_pillars=4096)
    test_cfg = dict(
        score_threshold=0.0,
        post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        nms=dict(nms_pre_max_size=128, nms_post_max_size=16,
                 nms_iou_threshold=0.7),
    )
    det = build_detector(cfg, test_cfg=test_cfg)

    points, mask = _sweep_points(rng, b=1, s=2)
    # identity sweep transforms: pure rotation/translation of zero
    tfs = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    example = {"points": points, "points_mask": mask,
               "sweep_transforms": tfs}
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), example)
    out = det.predict(variables, example)
    assert out["box3d_lidar"].shape[-1] in (7, 9)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_strobe_uses_previous_sweep(rng):
    """Zeroing the first sweep's points changes the last sweep's output:
    the temporal carry is live."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models import build_detector

    reader, neck, bbox_head = _pillar_parts("RPNUber")
    det = build_detector(
        dict(type="STROBE", reader=reader, neck=neck, bbox_head=bbox_head,
             max_pillars=4096))
    points, mask = _sweep_points(rng, b=1, s=2)
    example = {"points": points, "points_mask": mask}
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), example)

    preds_full, _ = det.forward(variables, example, train=False)
    example_cut = {"points": points,
                   "points_mask": mask.at[:, 0].set(False)}
    preds_cut, _ = det.forward(variables, example_cut, train=False)
    hm_a = np.asarray(preds_full["det_preds"][0]["hm"])
    hm_b = np.asarray(preds_cut["det_preds"][0]["hm"])
    assert np.abs(hm_a - hm_b).max() > 1e-6


def _lstm_cfg(det_type, n_sectors):
    reader, neck, bbox_head = _pillar_parts("RPNTECP")
    bbox_head = dict(bbox_head)
    vg = dict(bbox_head["voxel_generator"])
    vg["nsectors"] = n_sectors
    bbox_head["voxel_generator"] = vg
    return dict(type=det_type, reader=reader, neck=neck,
                bbox_head=bbox_head)


@pytest.mark.parametrize("det_type", ["PointPillarsLSTM",
                                      "PointPillarsNoLSTM"])
def test_pplstm_loss_and_predict(rng, det_type):
    import jax
    import jax.numpy as jnp

    from partner_tpu.data.pipeline import AssignLabel
    from partner_tpu.models import build_detector
    from tests.test_polarstream import _points

    n_sectors = 2
    test_cfg = dict(
        score_threshold=0.0,
        post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        nms=dict(nms_pre_max_size=128, nms_post_max_size=16,
                 nms_iou_threshold=0.7),
    )
    det = build_detector(_lstm_cfg(det_type, n_sectors), test_cfg=test_cfg)
    boxes, pts, mask = _points(rng)
    example = {"points": pts, "points_mask": mask}
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), example)

    out = det.predict(variables, example)
    assert np.isfinite(np.asarray(out["scores"])).all()

    vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
          (TINY_PR[4] - TINY_PR[1]) / GRID[1],
          TINY_PR[5] - TINY_PR[2]]
    al = AssignLabel(cfg=dict(
        target_assigner=dict(tasks=[dict(num_class=1, class_names=["car"])]),
        out_size_factor=2, max_objs=16, voxel_shape="cylinder",
        nsectors=n_sectors,
    ), with_votemap=False, with_global_box=False)
    res = {"mode": "train",
           "lidar": {"voxels": dict(shape=(GRID[0], GRID[1], 1),
                                    range=np.asarray(TINY_PR),
                                    size=np.asarray(vs)),
                     "annotations": {
                         "gt_boxes": boxes,
                         "gt_classes": np.ones(len(boxes), np.int64)}}}
    res, _ = al(res, {})
    t = res["lidar"]["targets"]
    for k in ("hm", "anno_box", "ind", "mask", "cat"):
        example[k] = [jnp.asarray(t[k][0])[None]]
    ld, _ = det.loss(variables, example, jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["loss"]))


def test_pplstm_memory_is_live(rng):
    """The LSTM hidden state couples sectors: zeroing sector-0 points
    changes sector-1 predictions even with a context-free neck."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models import build_detector
    from tests.test_polarstream import _points

    det = build_detector(_lstm_cfg("PointPillarsLSTM", 2), test_cfg={})
    _, pts, mask = _points(rng)
    example = {"points": pts, "points_mask": mask}
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), example)
    preds_a, _ = det.forward(variables, example, train=False)

    phi = np.asarray(pts[..., 1])
    first_half = jnp.asarray(phi < 0.0)  # sector 0 azimuth span
    cut = {"points": pts, "points_mask": mask & ~first_half}
    preds_b, _ = det.forward(variables, cut, train=False)
    hm_a = np.asarray(preds_a["sector_preds"][1]["det_preds"][0]["hm"])
    hm_b = np.asarray(preds_b["sector_preds"][1]["det_preds"][0]["hm"])
    assert np.abs(hm_a - hm_b).max() > 1e-6

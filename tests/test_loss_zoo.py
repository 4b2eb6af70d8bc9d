"""IoU-regression loss zoo, corner loss, circle-NMS, CenterCoderV2.

Covers the reference components IouRegLoss / get_corner_loss_lidar
(/root/reference/det3d/models/e2e_utils/loss_utils.py:212-236,596-612),
circle_nms (core/utils/circle_nms_jit.py), and CenterCoderV2
(e2e_utils/box_coder_utils.py:280-497).
"""

import jax
import jax.numpy as jnp
import numpy as np

from partner_tpu.core.center_coder import CenterCoder, CenterCoderV2
from partner_tpu.losses.iou_losses import (
    bbox3d_overlaps_diou, bbox3d_overlaps_giou, bbox3d_overlaps_iou,
    corner_loss_lidar, corners_3d, iou_reg_loss,
)
from partner_tpu.ops.nms import circle_nms


def _boxes(rng, n):
    return jnp.asarray(np.stack([
        rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
        rng.uniform(-1, 1, n),
        rng.uniform(2, 6, n), rng.uniform(1, 3, n), rng.uniform(1, 2, n),
        rng.uniform(-np.pi, np.pi, n),
    ], 1).astype(np.float32))


def test_overlaps_identity(rng):
    b = _boxes(rng, 16)
    np.testing.assert_allclose(bbox3d_overlaps_iou(b, b), 1.0, atol=1e-3)
    np.testing.assert_allclose(bbox3d_overlaps_giou(b, b), 1.0, atol=1e-3)
    np.testing.assert_allclose(bbox3d_overlaps_diou(b, b), 1.0, atol=1e-3)


def test_overlaps_orderings(rng):
    """DIoU/GIoU penalize center distance; all variants <= IoU."""
    b = _boxes(rng, 16)
    near = b.at[:, :2].add(0.5)
    far = b.at[:, :2].add(5.0)
    iou_n, diou_n = bbox3d_overlaps_iou(b, near), bbox3d_overlaps_diou(b, near)
    diou_f = bbox3d_overlaps_diou(b, far)
    giou_n = bbox3d_overlaps_giou(b, near)
    assert np.all(np.asarray(diou_n) <= np.asarray(iou_n) + 1e-6)
    assert np.all(np.asarray(giou_n) <= np.asarray(iou_n) + 1e-6)
    assert np.all(np.asarray(diou_f) < np.asarray(diou_n))
    # disjoint-far DIoU is negative (pure distance penalty)
    assert np.all(np.asarray(diou_f) < 0)


def test_iou_reg_loss_gradient_pulls_together(rng):
    b = _boxes(rng, 4)
    pred = b.at[:, :2].add(1.0)

    g = jax.grad(lambda p: iou_reg_loss(p, b, "DIoU"))(pred)
    # gradient on centers points away from gt (loss decreases toward gt)
    step = pred[:, :2] - 0.01 * g[:, :2]
    d_old = jnp.sum((pred[:, :2] - b[:, :2]) ** 2)
    d_new = jnp.sum((step - b[:, :2]) ** 2)
    assert float(d_new) < float(d_old)
    assert np.isfinite(np.asarray(g)).all()


def test_corner_loss_flip_invariance(rng):
    b = _boxes(rng, 8)
    flipped = b.at[:, 6].add(jnp.pi)
    np.testing.assert_allclose(corner_loss_lidar(b, b), 0.0, atol=1e-4)
    np.testing.assert_allclose(corner_loss_lidar(b, flipped), 0.0, atol=1e-3)
    shifted = b.at[:, 0].add(2.0)
    assert np.all(np.asarray(corner_loss_lidar(shifted, b)) > 0.5)


def test_corners_3d_shape(rng):
    b = _boxes(rng, 5)
    c = corners_3d(b)
    assert c.shape == (5, 8, 3)
    # corners centered on the box
    np.testing.assert_allclose(c.mean(axis=1), b[:, :3], atol=1e-4)


def _circle_nms_oracle(centers, scores, min_radius, post):
    # Mirrors the reference numba kernel (circle_nms_jit.py:97-101):
    # SQUARED distance compared against the UN-squared threshold.
    order = np.argsort(-scores)
    kept = []
    for i in order:
        if not np.isfinite(scores[i]):
            continue
        ok = all((centers[i, 0] - centers[j, 0]) ** 2
                 + (centers[i, 1] - centers[j, 1]) ** 2 > min_radius
                 for j in kept)
        if ok:
            kept.append(i)
        if len(kept) == post:
            break
    return kept


def test_circle_nms_vs_oracle(rng):
    for _ in range(5):
        centers = rng.uniform(-10, 10, (64, 2)).astype(np.float32)
        scores = rng.rand(64).astype(np.float32)
        scores[::9] = -np.inf  # padded rows
        want = _circle_nms_oracle(centers, scores, 2.0, 20)
        ki, km = circle_nms(jnp.asarray(centers), jnp.asarray(scores), 2.0, 20)
        got = list(np.asarray(ki)[np.asarray(km)])
        assert got == want


def test_circle_nms_vs_executed_reference_kernel(rng):
    """Golden: the reference's own numba circle_nms (circle_nms_jit.py,
    run as pure Python with numba stubbed) on finite-score rows."""
    import importlib.util

    from reference_loader import _install_stubs

    _install_stubs()
    spec = importlib.util.spec_from_file_location(
        "_ref_circle_nms",
        "/root/reference/det3d/core/utils/circle_nms_jit.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for _ in range(5):
        centers = rng.uniform(-10, 10, (48, 2)).astype(np.float32)
        scores = rng.rand(48).astype(np.float32)
        dets = np.concatenate([centers, scores[:, None]], 1)
        want = list(mod.circle_nms(dets.astype(np.float64), 2.0))[:20]
        ki, km = circle_nms(jnp.asarray(centers), jnp.asarray(scores),
                            2.0, 20)
        got = list(np.asarray(ki)[np.asarray(km)])
        assert got == want


def test_center_coder_v2_roundtrip(rng):
    coder = CenterCoderV2(rectify=False)
    b = _boxes(rng, 8)
    enc = coder.encode(b)
    dec = coder.decode(enc)
    np.testing.assert_allclose(dec[:, :6], b[:, :6], atol=1e-4)
    # yaw equal modulo 2pi
    dy = np.asarray(jnp.cos(dec[:, 6] - b[:, 6]))
    np.testing.assert_allclose(dy, 1.0, atol=1e-4)
    # delta of a perfect prediction is zero
    np.testing.assert_allclose(coder.get_delta(b, enc), 0.0, atol=1e-5)


def test_center_coder_v2_rectified_delta(rng):
    """A prediction whose yaw is cell-relative scores zero delta once the
    cell azimuth is supplied."""
    coder = CenterCoderV2(rectify=True)
    b = _boxes(rng, 8)
    xg, yg = b[:, 0], b[:, 1]
    cell_az = jnp.arctan2(yg, xg)
    enc = CenterCoderV2(rectify=False).encode(b)
    rel = b[:, 6] - cell_az
    enc_rel = enc.at[:, 6].set(jnp.cos(rel)).at[:, 7].set(jnp.sin(rel))
    d = coder.get_delta(b, enc_rel, x_grid=xg, y_grid=yg)
    np.testing.assert_allclose(np.abs(np.asarray(d)).max(), 0.0, atol=1e-4)


def test_encode_with_rois_identity(rng):
    coder = CenterCoderV2()
    b = _boxes(rng, 8)
    enc = coder.encode_with_rois(b, b)
    np.testing.assert_allclose(np.asarray(enc), 0.0, atol=1e-5)


def test_set_criterion_iou_reg(rng):
    """loss_iou_reg is finite, differentiable, and falls for better boxes."""
    from partner_tpu.losses.set_crit import SetCriterion

    coder = CenterCoder(rectify=False)
    crit = SetCriterion(
        coder, weight_dict={"loss_ce": 1.0, "loss_bbox": 1.0,
                            "loss_iou_reg": 1.0},
        losses=["loss_ce", "loss_bbox", "loss_iou_reg"],
    )
    b, m, n, ncls = 2, 4, 16, 3
    gt = np.zeros((b, m, 7), np.float32)
    gt[..., 3:6] = 3.0
    gt[..., 0] = np.arange(m) * 10.0
    gt_boxes = jnp.asarray(gt)
    gt_classes = jnp.zeros((b, m), jnp.int32)
    gt_mask = jnp.ones((b, m), bool)
    enc = coder.encode(gt_boxes)
    preds_good = {
        "pred_logits": jnp.full((b, n, ncls), -4.0),
        "pred_boxes": jnp.tile(enc, (1, n // m, 1)),
    }
    preds_bad = {
        "pred_logits": preds_good["pred_logits"],
        "pred_boxes": preds_good["pred_boxes"].at[..., :2].add(2.0),
    }
    lg = crit(preds_good, gt_boxes, gt_classes, gt_mask)
    lb = crit(preds_bad, gt_boxes, gt_classes, gt_mask)
    assert np.isfinite(float(lg["loss"])) and np.isfinite(float(lb["loss"]))
    assert float(lg["loss_iou_reg"]) < float(lb["loss_iou_reg"])


def test_center_coder_polar_roundtrip(rng):
    """decode(encode(b)) == b for the polar coder, both rectify modes
    (box_coder_utils.py:498-720)."""
    from partner_tpu.core.center_coder import CenterCoderPolar

    b = _boxes(rng, 12)
    # dx > 0 guaranteed by _boxes; keep yaw away from the wrap boundary
    for rectify in (False, True):
        coder = CenterCoderPolar(rectify=rectify)
        dec = coder.decode(coder.encode(b))
        np.testing.assert_allclose(np.asarray(dec[:, :6]),
                                   np.asarray(b[:, :6]), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(jnp.cos(dec[:, 6] - b[:, 6])), 1.0, atol=1e-4)


def test_template_coders_roundtrip(rng):
    """TP/PolarTP/MTTP coders: decode(encode(b)) == b (box_coder_utils.py:
    726-954, 1189-1399, 1402-1599)."""
    from partner_tpu.core.center_coder import (CenterCoderMTTP,
                                               CenterCoderPolarTP,
                                               CenterCoderTP)

    b = _boxes(rng, 10)
    coders = [
        CenterCoderTP(templates_box=(4.0, 2.0, 1.6)),
        CenterCoderPolarTP(template_ratio=0.5, rectify=False),
        CenterCoderPolarTP(template_ratio=0.5, rectify=True),
        CenterCoderMTTP(tmp_box=((4.0, 2.0, 1.6), (0.8, 0.8, 1.8))),
    ]
    for coder in coders:
        dec = coder.decode(coder.encode(b))
        np.testing.assert_allclose(np.asarray(dec[:, :6]),
                                   np.asarray(b[:, :6]), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(jnp.cos(dec[:, 6] - b[:, 6])), 1.0, atol=1e-4)

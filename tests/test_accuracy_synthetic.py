"""End-to-end accuracy evidence on synthetic scenes.

Train the tiny PARTNER detector on a fixed synthetic scene, then evaluate
its detections with the real AP/APH metric pipeline
(eval/detection_metrics.py) — the train -> predict -> metric loop the
reference exercises via dist_test + the Waymo devkit (SURVEY §4
"validation-as-test"). Overfitting one scene must recover the boxes
almost exactly, so AP provides a hard accuracy bar, not just loss-goes-
down evidence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partner_tpu import testing
from partner_tpu.eval import detection_metrics as dm
from partner_tpu.eval import waymo_protocol as wp
from partner_tpu.models import build_detector
from partner_tpu.train.optim import build_one_cycle_optimizer
from partner_tpu.train.train_state import create_train_state, make_train_step


@pytest.mark.slow
def test_overfit_then_ap(rng):
    det = build_detector(testing.tiny_model_cfg(), test_cfg=dict(
        score_threshold=0.1,
        post_center_limit_range=[-40, -40, -5, 40, 40, 5],
        nms=dict(nms_pre_max_size=256, nms_post_max_size=16,
                 nms_iou_threshold=0.7),
    ))
    example = testing.make_example(rng, b=1, n_points=1500, cap=2048)

    variables = jax.jit(det.init)(jax.random.PRNGKey(0), example)
    steps = 220
    tx = build_one_cycle_optimizer(lr_max=3e-3, total_steps=steps)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(det, tx))

    key = jax.random.PRNGKey(1)
    loss0 = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, example, sub)
        if i == 0:
            loss0 = float(metrics["loss"])
    loss1 = float(metrics["loss"])
    assert np.isfinite(loss1) and loss1 < loss0 * 0.5, (loss0, loss1)

    out = det.predict(
        {"params": state.params, "batch_stats": state.batch_stats}, example)
    m = np.asarray(out["mask"][0])
    boxes = np.asarray(out["box3d_lidar"][0])[m]
    scores = np.asarray(out["scores"][0])[m]

    gt_boxes = np.asarray(example["global_box"][0])
    gt_boxes = gt_boxes[gt_boxes[:, 7] > 0][:, :7]

    detections = {"scene0": {
        "box3d_lidar": boxes, "scores": scores,
        "label_preds": np.zeros(len(boxes), np.int64)}}
    gts = {"scene0": {"gt_boxes": gt_boxes,
                      "gt_classes": np.zeros(len(gt_boxes), np.int64)}}
    metrics = dm.waymo_ap_aph(detections, gts, ["Vehicle"])
    ap = metrics["AP/Vehicle"]
    aph = metrics["APH/Vehicle"]
    print(f"synthetic overfit AP={ap:.3f} APH={aph:.3f} "
          f"loss {loss0:.2f}->{loss1:.2f}")
    assert ap >= 0.5, f"overfit AP too low: {ap}"
    assert aph >= 0.3, f"overfit APH too low: {aph}"

    # official-protocol gate (eval/waymo_protocol.py): Hungarian matching
    # per score cutoff + LEVEL difficulty + recall-delta-capped AP. On an
    # n_gt-box scene recall has only n_gt distinct values, so the capped
    # integral is bounded by 0.05 * n_gt even for perfect detections —
    # gate against half that ceiling rather than an absolute number.
    gts_l = {"scene0": {**gts["scene0"],
                        "num_points": np.full(len(gt_boxes), 100),
                        "difficulty": np.zeros(len(gt_boxes), np.int64)}}
    official = wp.waymo_official_metrics(detections, gts_l, ["Vehicle"])
    ceiling = 0.05 * min(len(gt_boxes), 20)
    print(f"official mAPH/L2={official['mAPH/L2']:.3f} "
          f"(capped ceiling {ceiling:.2f})")
    assert official["mAPH/L2"] >= 0.5 * ceiling, official
    assert official["mAP/L1"] >= 0.5 * ceiling, official


@pytest.mark.slow
def test_overfit_then_ap_trunk2d(rng):
    """Same train -> AP gate through the flagship's dense z-folded 2D
    trunk (PolarDenseFHD trunk2d) — accuracy evidence for the backbone
    the full-scale flagship actually runs."""
    cfg = testing.tiny_model_cfg()
    cfg["backbone"] = dict(type="PolarDenseFHD", num_input_features=5,
                           trunk2d=True, a2d_features=48, out_features=64,
                           compute_dtype="float32")
    det = build_detector(cfg, test_cfg=dict(
        score_threshold=0.1,
        post_center_limit_range=[-40, -40, -5, 40, 40, 5],
        nms=dict(nms_pre_max_size=256, nms_post_max_size=16,
                 nms_iou_threshold=0.7),
    ))
    example = testing.make_example(rng, b=1, n_points=1500, cap=2048)

    variables = jax.jit(det.init)(jax.random.PRNGKey(0), example)
    steps = 220
    tx = build_one_cycle_optimizer(lr_max=3e-3, total_steps=steps)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(det, tx))

    key = jax.random.PRNGKey(1)
    loss0 = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, example, sub)
        if i == 0:
            loss0 = float(metrics["loss"])
    loss1 = float(metrics["loss"])
    assert np.isfinite(loss1) and loss1 < loss0 * 0.5, (loss0, loss1)

    out = det.predict(
        {"params": state.params, "batch_stats": state.batch_stats}, example)
    m = np.asarray(out["mask"][0])
    boxes = np.asarray(out["box3d_lidar"][0])[m]
    scores = np.asarray(out["scores"][0])[m]
    gt_boxes = np.asarray(example["global_box"][0])
    gt_boxes = gt_boxes[gt_boxes[:, 7] > 0][:, :7]
    detections = {"scene0": {
        "box3d_lidar": boxes, "scores": scores,
        "label_preds": np.zeros(len(boxes), np.int64)}}
    gts = {"scene0": {"gt_boxes": gt_boxes,
                      "gt_classes": np.zeros(len(gt_boxes), np.int64)}}
    metrics = dm.waymo_ap_aph(detections, gts, ["Vehicle"])
    ap = metrics["AP/Vehicle"]
    print(f"trunk2d overfit AP={ap:.3f} "
          f"loss {loss0:.2f}->{loss1:.2f}")
    assert ap >= 0.5, f"trunk2d overfit AP too low: {ap}"

"""Hand-computed fixtures for the official metric protocols.

Waymo (eval/waymo_protocol.py): LEVEL_1/LEVEL_2 difficulty handling,
Hungarian (not greedy) matching, recall-delta-capped AP integration,
range shards. nuScenes (eval/nusc_protocol.py): 101-point interpolation,
0.1 recall/precision clipping, TP errors over the recall band, NDS.

Every expected number below is derived by hand in the comments.
"""

import numpy as np
import pytest

from partner_tpu.eval.nusc_protocol import nusc_official_metrics
from partner_tpu.eval.waymo_protocol import (combined_difficulty,
                                             waymo_official_metrics)


def _box(x, y, yaw=0.0, dx=4.0, dy=2.0):
    return [x, y, 0.0, dx, dy, 1.5, yaw]


def test_combined_difficulty():
    # labeler flag wins when set; else num_points >= 5 -> L1 else L2;
    # 0 points -> ignore; unknown (-1) counts as L1
    npts = [10, 3, 0, 10, -1]
    labeler = [0, 0, 0, 2, 0]
    np.testing.assert_array_equal(
        combined_difficulty(npts, labeler), [1, 2, 999, 2, 1])


def test_waymo_two_det_exact_ap():
    """2 perfect dets, scores .9/.8, 2 L1 gts. Cutoffs {.8,.9}:
    (rec, prec) = (1, 1) and (.5, 1). AP = min(.5,.05)*1 + min(.5,.05)*1
    = 0.1 (recall-delta capping)."""
    gts = {"f0": {"gt_boxes": np.array([_box(0, 0), _box(20, 0)]),
                  "gt_classes": np.array([0, 0]),
                  "num_points": np.array([10, 10]),
                  "difficulty": np.array([0, 0])}}
    dets = {"f0": {"box3d_lidar": np.array([_box(0, 0), _box(20, 0)]),
                   "scores": np.array([0.9, 0.8]),
                   "label_preds": np.array([0, 0])}}
    m = waymo_official_metrics(dets, gts, ["Vehicle"])
    assert m["AP/L2/Vehicle"] == pytest.approx(0.1)
    assert m["APH/L2/Vehicle"] == pytest.approx(0.1)
    assert m["mAPH/L2"] == pytest.approx(0.1)


def test_waymo_level_split_and_ignored_match():
    """gt1 has 10 pts (L1), gt2 has 3 pts (L2). Perfect dets .9 on gt1,
    .8 on gt2.
    L2: as in the 2-det case -> AP 0.1.
    L1: gt2 is ignorable; det2's match is neither TP nor FP, so both
    cutoffs give (rec 1, prec 1) -> one distinct recall point ->
    AP = min(1, .05) * 1 = 0.05."""
    gts = {"f0": {"gt_boxes": np.array([_box(0, 0), _box(20, 0)]),
                  "gt_classes": np.array([0, 0]),
                  "num_points": np.array([10, 3]),
                  "difficulty": np.array([0, 0])}}
    dets = {"f0": {"box3d_lidar": np.array([_box(0, 0), _box(20, 0)]),
                   "scores": np.array([0.9, 0.8]),
                   "label_preds": np.array([0, 0])}}
    m = waymo_official_metrics(dets, gts, ["Vehicle"])
    assert m["AP/L2/Vehicle"] == pytest.approx(0.1)
    assert m["AP/L1/Vehicle"] == pytest.approx(0.05)


def test_waymo_zero_point_gt_ignored():
    """A 0-point gt is never an FN, and a det matching it is not an FP."""
    gts = {"f0": {"gt_boxes": np.array([_box(0, 0), _box(20, 0)]),
                  "gt_classes": np.array([0, 0]),
                  "num_points": np.array([10, 0]),
                  "difficulty": np.array([0, 0])}}
    dets = {"f0": {"box3d_lidar": np.array([_box(0, 0), _box(20, 0)]),
                   "scores": np.array([0.9, 0.8]),
                   "label_preds": np.array([0, 0])}}
    m = waymo_official_metrics(dets, gts, ["Vehicle"])
    # identical to a single-gt perfect run: one recall point at 1.0
    assert m["AP/L2/Vehicle"] == pytest.approx(0.05)
    assert m["AP/L1/Vehicle"] == pytest.approx(0.05)


def test_waymo_heading_weight():
    """One det rotated by pi/2: heading accuracy 0.5, so APH = AP/2 at
    every operating point."""
    gts = {"f0": {"gt_boxes": np.array([_box(0, 0, yaw=0.0,
                                             dx=4.0, dy=4.0)]),
                  "gt_classes": np.array([0]),
                  "num_points": np.array([10]),
                  "difficulty": np.array([0])}}
    dets = {"f0": {"box3d_lidar": np.array([_box(0, 0, yaw=np.pi / 2,
                                                 dx=4.0, dy=4.0)]),
                   "scores": np.array([0.9]),
                   "label_preds": np.array([0])}}
    # square box so the rotated det still overlaps IoU 1.0
    m = waymo_official_metrics(dets, gts, ["Vehicle"])
    assert m["AP/L2/Vehicle"] == pytest.approx(0.05)
    assert m["APH/L2/Vehicle"] == pytest.approx(0.025)


def test_waymo_hungarian_beats_greedy():
    """Det A (high score) overlaps gt1 and gt2; det B only overlaps gt2.
    Greedy would give A->gt2 (its best), stranding B. Hungarian assigns
    A->gt1, B->gt2: 2 TPs at the all-dets cutoff (recall 1)."""
    # gt1/gt2 4x2 boxes side by side; A sits between, B on gt2
    gts = {"f0": {"gt_boxes": np.array([_box(0, 0), _box(3.0, 0)]),
                  "gt_classes": np.array([0, 0]),
                  "num_points": np.array([10, 10]),
                  "difficulty": np.array([0, 0])}}
    a = _box(1.4, 0)   # IoU with gt2 slightly higher than with gt1
    b = _box(3.0, 0)   # perfect on gt2
    dets = {"f0": {"box3d_lidar": np.array([a, b]),
                   "scores": np.array([0.9, 0.8]),
                   "label_preds": np.array([0, 0])}}
    m = waymo_official_metrics(dets, gts, ["Vehicle"],
                               iou_thresholds={"Vehicle": 0.2})
    # both cutoffs reach (rec, prec): (.5, 1) @ .9 (A matches something)
    # and (1, 1) @ .8 -> AP = .05 + .05 = 0.1; greedy would cap recall
    # at .5 with a FP -> AP 0.05 and precision 0.5 at the second point.
    assert m["AP/L2/Vehicle"] == pytest.approx(0.1)


def test_waymo_range_shards():
    """gt/det pairs at r=10 and r=40 land in [0,30) and [30,50)."""
    gts = {"f0": {"gt_boxes": np.array([_box(10, 0), _box(40, 0)]),
                  "gt_classes": np.array([0, 0]),
                  "num_points": np.array([10, 10]),
                  "difficulty": np.array([0, 0])}}
    dets = {"f0": {"box3d_lidar": np.array([_box(10, 0), _box(40, 0)]),
                   "scores": np.array([0.9, 0.8]),
                   "label_preds": np.array([0, 0])}}
    m = waymo_official_metrics(dets, gts, ["Vehicle"])
    assert m["AP/L2/Vehicle/[0,30)"] == pytest.approx(0.05)
    assert m["AP/L2/Vehicle/[30,50)"] == pytest.approx(0.05)
    assert "AP/L2/Vehicle/[50,inf)" not in m  # no gts there


# ---------------------------------------------------------------------------
# nuScenes
# ---------------------------------------------------------------------------


def _nbox(x, y, yaw=0.0, size=(4.0, 2.0, 1.5)):
    return [x, y, 0.0, size[0], size[1], size[2], yaw]


def test_nusc_half_recall_hand_computed():
    """10 gts, 5 TP dets offset 0.3 m, no FPs, identical sizes/yaw.

    precision = 1 up to recall 0.5 -> on the 101-bin grid bins 0..50 are
    1.0, the rest 0 (right-fill). calc_ap drops bins 0..10, clips 0.1:
    AP = (40 * 0.9) / 90 / 0.9 = 0.444444....
    ATE: cummean(0.3,...) = 0.3 over bins 11..50 -> 0.3. ASE = AOE = 0.
    AVE undefined (7-col boxes). NDS over {ATE, ASE, AOE}:
    (5 * 0.444444 + 0.7 + 1 + 1) / 8 = 0.6152777...
    """
    gt_boxes = np.array([_nbox(4.0 * i, 0) for i in range(10)])
    gts = {"s0": {"gt_boxes": gt_boxes,
                  "gt_classes": np.zeros(10, np.int64)}}
    det_boxes = np.array([_nbox(4.0 * i, 0.3) for i in range(5)])
    dets = {"s0": {"box3d_lidar": det_boxes,
                   "scores": np.linspace(0.9, 0.5, 5),
                   "label_preds": np.zeros(5, np.int64)}}
    m = nusc_official_metrics(dets, gts, ["car"])
    assert m["AP/car"] == pytest.approx(0.4444444, abs=1e-6)
    assert m["mATE"] == pytest.approx(0.3, abs=1e-6)
    assert m["mASE"] == pytest.approx(0.0, abs=1e-6)
    assert m["mAOE"] == pytest.approx(0.0, abs=1e-6)
    assert "mAVE" not in m
    assert m["NDS"] == pytest.approx(0.6152778, abs=1e-6)
    assert m["nds_tp_metrics"] == "ATE,ASE,AOE"


def test_nusc_perfect_is_one():
    gt_boxes = np.array([_nbox(3.0 * i, 0) for i in range(4)])
    gts = {"s0": {"gt_boxes": gt_boxes,
                  "gt_classes": np.zeros(4, np.int64)}}
    dets = {"s0": {"box3d_lidar": gt_boxes.copy(),
                   "scores": np.linspace(0.9, 0.6, 4),
                   "label_preds": np.zeros(4, np.int64)}}
    m = nusc_official_metrics(dets, gts, ["car"])
    assert m["AP/car"] == pytest.approx(1.0)
    assert m["NDS"] == pytest.approx(1.0)


def test_nusc_class_range_filter():
    """A det+gt pair beyond the class range must not count at all; a
    far-away FP outside range is also dropped (devkit filters both)."""
    gts = {"s0": {"gt_boxes": np.array([_nbox(10, 0), _nbox(100, 0)]),
                  "gt_classes": np.zeros(2, np.int64)}}
    dets = {"s0": {"box3d_lidar": np.array([_nbox(10, 0), _nbox(100, 0),
                                            _nbox(90, 0)]),
                   "scores": np.array([0.9, 0.8, 0.7]),
                   "label_preds": np.zeros(3, np.int64)}}
    m = nusc_official_metrics(dets, gts, ["car"])
    # one gt in range, matched perfectly: AP = 1
    assert m["AP/car"] == pytest.approx(1.0)


def test_nusc_below_min_recall_is_zero():
    """A class whose best recall never reaches 10% gets AP 0 and TP
    errors 1.0 (devkit convention)."""
    gt_boxes = np.array([_nbox(3.0 * i, 0) for i in range(20)])
    gts = {"s0": {"gt_boxes": gt_boxes,
                  "gt_classes": np.zeros(20, np.int64)}}
    dets = {"s0": {"box3d_lidar": gt_boxes[:1].copy(),
                   "scores": np.array([0.9]),
                   "label_preds": np.zeros(1, np.int64)}}
    m = nusc_official_metrics(dets, gts, ["car"])
    # recall tops out at 1/20 = 5% < 10%: all clipped
    assert m["AP/car"] == pytest.approx(0.0)
    assert m["mATE"] == pytest.approx(1.0)


def test_nusc_orientation_period_barrier():
    """Barrier orientation error is modulo pi: a 180-degree flip is 0."""
    gts = {"s0": {"gt_boxes": np.array([_nbox(5, 0, yaw=0.0)]),
                  "gt_classes": np.zeros(1, np.int64)}}
    dets = {"s0": {"box3d_lidar": np.array([_nbox(5, 0, yaw=np.pi)]),
                   "scores": np.array([0.9]),
                   "label_preds": np.zeros(1, np.int64)}}
    m = nusc_official_metrics(dets, gts, ["barrier"])
    assert m["mAOE"] == pytest.approx(0.0, abs=1e-6)
    m2 = nusc_official_metrics(dets, gts, ["car"])
    assert m2["mAOE"] == pytest.approx(np.pi, abs=1e-6)


def test_nusc_velocity_error():
    """9-col boxes carry vx, vy; AVE is the L2 velocity error on TPs."""
    gt = np.array([[5, 0, 0, 4, 2, 1.5, 1.0, 0.0, 0.0]])
    det = np.array([[5, 0, 0, 4, 2, 1.5, 1.5, 0.0, 0.0]])
    gts = {"s0": {"gt_boxes": gt, "gt_classes": np.zeros(1, np.int64)}}
    dets = {"s0": {"box3d_lidar": det, "scores": np.array([0.9]),
                   "label_preds": np.zeros(1, np.int64)}}
    m = nusc_official_metrics(dets, gts, ["car"])
    assert m["mAVE"] == pytest.approx(0.5, abs=1e-6)
    assert "AVE" in m["nds_tp_metrics"]

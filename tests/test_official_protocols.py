"""Hand-computed fixtures for the official metric protocols.

Waymo (eval/waymo_protocol.py): LEVEL_1/LEVEL_2 difficulty handling,
Hungarian (not greedy) matching, recall-delta-capped AP integration,
range shards. nuScenes (eval/nusc_protocol.py): 101-point interpolation,
0.1 recall/precision clipping, TP errors over the recall band, NDS.

Every expected number below is derived by hand in the comments.
"""

import itertools

import numpy as np
import pytest

from partner_tpu.eval.detection_metrics import (_greedy_match,
                                                bev_iou_matrix,
                                                waymo_ap_aph)
from partner_tpu.eval.nusc_protocol import nusc_official_metrics
from partner_tpu.eval.waymo_protocol import (_ap_from_pr, _hungarian_match,
                                             _score_cutoffs,
                                             combined_difficulty,
                                             waymo_official_metrics)
from reference_loader import load_reference_kitti_eval


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


# ---------------------------------------------------------------------------
# Golden cross-validation vs the reference's EXECUTED KITTI eval kernels
# (det3d/datasets/utils/eval.py, run as pure Python with numba stubbed) —
# the only executable official-metric oracle in the sandbox. Covers the
# matching + TP/FP/FN accounting + P/R accumulation semantics shared by
# eval/detection_metrics.py and eval/waymo_protocol.py.
# ---------------------------------------------------------------------------


def _star_scenes(rng, n_frames, thr):
    """Random scenes whose overlap graph is star-shaped: every det overlaps
    at most ONE gt (gts 20 m apart, dets perturbed <= 2.5 m, noise FPs on
    the dual grid), but a gt may have several candidate dets. On such
    scenes every maximal matching — the reference kernel's gt-ordered
    max-overlap pick (eval.py:175-236), our score-ordered greedy, and the
    protocol's Hungarian — produces identical TP/FP/FN counts at every
    score cutoff, so the executed reference kernel is an exact counting
    oracle for both of our matchers."""
    dets, gts = {}, {}
    for f in range(n_frames):
        token = f"f{f}"
        n_gt = 6 + int(rng.randint(0, 3))
        gt_boxes, det_boxes, scores = [], [], []
        num_points = []
        for i in range(n_gt):
            cx, cy = 20.0 * (i % 8), 20.0 * (i // 8)
            yaw = rng.uniform(-np.pi, np.pi)
            gt_boxes.append([cx, cy, 0.0, 4.0 + rng.rand(),
                             2.0 + rng.rand(), 1.5, yaw])
            num_points.append(int(rng.choice([10, 3, 0])))
            for _ in range(int(rng.randint(0, 3))):
                mag = float(rng.choice([0.4, 2.8]))  # high-IoU or below-thr
                det_boxes.append([cx + rng.uniform(-mag, mag),
                                  cy + rng.uniform(-mag, mag), 0.0,
                                  4.0 + rng.rand(), 2.0 + rng.rand(), 1.5,
                                  yaw + rng.uniform(-0.3, 0.3)])
                scores.append(rng.rand())
        for _ in range(3):  # noise FPs on the dual grid, >= 10 m from gts
            det_boxes.append([20.0 * rng.randint(0, 8) + 10.0,
                              20.0 * rng.randint(0, 2) + 10.0, 0.0,
                              4.0, 2.0, 1.5, rng.uniform(-np.pi, np.pi)])
            scores.append(rng.rand())
        gts[token] = {"gt_boxes": np.array(gt_boxes),
                      "gt_classes": np.zeros(n_gt, np.int64),
                      "num_points": np.array(num_points),
                      "difficulty": np.zeros(n_gt, np.int64)}
        dets[token] = {"box3d_lidar": np.array(det_boxes),
                       "scores": np.array(scores),
                       "label_preds": np.zeros(len(det_boxes), np.int64)}
    return dets, gts


def _ref_stats(ref, det_boxes, det_scores, gt_boxes, ignored_gt, thr, cutoff):
    """One frame through the executed reference compute_statistics_jit
    (metric=1/BEV, compute_fp=True), with the (det, gt) IoU from our
    shared Green's-theorem kernel. Returns (tp, fp, fn)."""
    n_det, n_gt = len(det_boxes), len(gt_boxes)
    overlaps = bev_iou_matrix(det_boxes, gt_boxes).astype(np.float64)
    gt_datas = np.zeros((n_gt, 5))
    gt_datas[:, 4] = gt_boxes[:, -1] if n_gt else 0.0
    dt_datas = np.zeros((n_det, 6))
    if n_det:
        dt_datas[:, 4] = det_boxes[:, -1]
        dt_datas[:, 5] = det_scores
    tp, fp, fn, _, _ = ref.compute_statistics_jit(
        overlaps, gt_datas, dt_datas,
        np.asarray(ignored_gt, np.int64), np.zeros(n_det, np.int64),
        np.zeros((0, 4)), 1, thr, thresh=float(cutoff), compute_fp=True)
    return tp, fp, fn


class TestKittiEvalGolden:
    @pytest.fixture(scope="class")
    def ref(self):
        return load_reference_kitti_eval()

    def test_greedy_counts_match_reference(self, ref):
        """waymo_ap_aph's score-ordered greedy matcher produces the
        reference kernel's exact TP/FP/FN on star scenes (thresh=0)."""
        rng = np.random.RandomState(7)
        thr = 0.5
        dets, gts = _star_scenes(rng, 4, thr)
        for token in dets:
            db, ds = dets[token]["box3d_lidar"], dets[token]["scores"]
            gb = gts[token]["gt_boxes"]
            match = _greedy_match(ds, bev_iou_matrix(db, gb), thr)
            tp = int((match >= 0).sum())
            fp = len(match) - tp
            fn = len(gb) - tp
            assert (tp, fp, fn) == _ref_stats(
                ref, db, ds, gb, np.zeros(len(gb)), thr, 0.0)

    def test_pooled_pr_ap_matches_reference_per_cutoff_rematch(self, ref):
        """waymo_ap_aph pools per-det (score, tp) rows and cumulates ONE
        matching; the reference re-matches at every score threshold. On
        star scenes the two must give the same P/R points at every
        distinct score, hence the same all-point AP."""
        rng = np.random.RandomState(11)
        thr = 0.55
        dets, gts = _star_scenes(rng, 3, thr)
        m = waymo_ap_aph(dets, gts, ["Vehicle"],
                         iou_thresholds={"Vehicle": thr})

        all_scores = np.sort(np.concatenate(
            [d["scores"] for d in dets.values()]))[::-1]
        recs, precs = [], []
        n_gt_total = sum(len(g["gt_boxes"]) for g in gts.values())
        for c in all_scores:
            tp = fp = 0
            for token in dets:
                t, f, _ = _ref_stats(
                    ref, dets[token]["box3d_lidar"], dets[token]["scores"],
                    gts[token]["gt_boxes"],
                    np.zeros(len(gts[token]["gt_boxes"])), thr, c)
                tp += t
                fp += f
            precs.append(tp / max(tp + fp, 1))
            recs.append(tp / n_gt_total)
        # all-point integration over the reference-derived curve
        r = np.asarray(recs)
        p = np.maximum.accumulate(np.asarray(precs)[::-1])[::-1]
        r_prev = np.concatenate([[0.0], r[:-1]])
        ap_ref = float(np.sum((r - r_prev) * p))
        assert m["AP/Vehicle"] == pytest.approx(ap_ref, abs=1e-9)

    def test_waymo_protocol_levels_match_reference_counts(self, ref):
        """waymo_official_metrics' LEVEL_1/LEVEL_2 AP equals the AP
        integrated from the executed reference kernel's per-cutoff
        TP/FP/FN, mapping ignorable difficulties to ignored_gt=1 (a
        matched det is neither TP nor FP — eval.py:221-224 and our
        'ignored' accounting share these semantics)."""
        rng = np.random.RandomState(23)
        thr = 0.5
        dets, gts = _star_scenes(rng, 3, thr)
        out = waymo_official_metrics(
            dets, gts, ["Vehicle"], iou_thresholds={"Vehicle": thr})

        pooled = np.concatenate([d["scores"] for d in dets.values()])
        cutoffs = _score_cutoffs(pooled, 51)
        for level in (1, 2):
            recs, precs = [], []
            n_gt_level = 0
            diffs = {}
            for token, gt in gts.items():
                diffs[token] = combined_difficulty(gt["num_points"],
                                                   gt["difficulty"])
                n_gt_level += int((diffs[token] <= level).sum())
            for c in cutoffs:
                tp = fp = fn = 0
                for token in dets:
                    ig = np.where(diffs[token] <= level, 0, 1)
                    t, f, n = _ref_stats(
                        ref, dets[token]["box3d_lidar"],
                        dets[token]["scores"], gts[token]["gt_boxes"],
                        ig, thr, c)
                    tp += t
                    fp += f
                    fn += n
                assert tp + fn == n_gt_level
                precs.append(tp / (tp + fp) if tp + fp else 0.0)
                recs.append(tp / n_gt_level)
            ap_ref = _ap_from_pr(recs, precs)
            assert out[f"AP/L{level}/Vehicle"] == pytest.approx(
                ap_ref, abs=1e-9)

    def test_bev_iou_matrix_vs_reference_image_overlap_axis_aligned(
            self, ref):
        """On yaw=0 boxes our Green's-theorem rotated IoU must equal the
        executed reference image_box_overlap (eval.py:277-307,
        criterion=-1/union) on the corner-format equivalents."""
        rng = np.random.RandomState(3)
        a = np.zeros((12, 7))
        b = np.zeros((9, 7))
        for arr in (a, b):
            n = len(arr)
            arr[:, 0:2] = rng.uniform(-10, 10, (n, 2))
            arr[:, 3:5] = rng.uniform(1.0, 6.0, (n, 2))
        ours = bev_iou_matrix(a, b)

        def corners(arr):
            return np.stack([arr[:, 0] - arr[:, 3] / 2,
                             arr[:, 1] - arr[:, 4] / 2,
                             arr[:, 0] + arr[:, 3] / 2,
                             arr[:, 1] + arr[:, 4] / 2], -1)

        want = ref.image_box_overlap(corners(a).astype(np.float64),
                                     corners(b).astype(np.float64))
        np.testing.assert_allclose(ours, want, atol=1e-5)

    def test_fast_hist_and_iou_match_reference(self, ref):
        """seg_metrics.fast_hist / per_class_iou vs the executed reference
        (eval.py:368-383), incl. out-of-range label filtering."""
        from partner_tpu.eval.seg_metrics import fast_hist, per_class_iou

        rng = np.random.RandomState(5)
        n = 9
        label = rng.randint(-2, n + 2, 5000)
        pred = rng.randint(0, n, 5000)
        ours = fast_hist(pred, label, n)
        want = ref.fast_hist(pred, label, n)
        np.testing.assert_array_equal(ours, want)
        with np.errstate(divide="ignore", invalid="ignore"):
            np.testing.assert_allclose(per_class_iou(ours),
                                       ref.per_class_iu(want))


def _brute_objective(iou, thr):
    """Exhaustive minimum of the exact assignment objective
    _hungarian_match hands to scipy (cost -iou for pairs with IoU >= thr,
    +1e-3 for disallowed pairs, complete assignment of min(n_det, n_gt)
    pairs) — max total IoU with an epsilon preference for fewer
    disallowed slots."""
    n_det, n_gt = iou.shape
    cost = np.where(iou >= thr, -iou, 1e-3)
    k = min(n_det, n_gt)
    best = np.inf
    for rows in itertools.permutations(range(n_det), k):
        for cols in itertools.permutations(range(n_gt), k):
            best = min(best, cost[list(rows), list(cols)].sum())
    return best


class TestHungarianAdversarial:
    """waymo_protocol._hungarian_match vs exhaustive enumeration on
    adversarial frames: ties, duplicate dets, dense many-to-many overlap
    where greedy matching is strictly suboptimal."""

    def _check(self, iou, thr):
        match = _hungarian_match(iou, thr)
        card = int((match >= 0).sum())
        used = match[match >= 0]
        assert len(np.unique(used)) == card  # injective
        assert all(iou[d, g] >= thr for d, g in enumerate(match) if g >= 0)
        tot = float(sum(iou[d, match[d]] for d in range(len(match))
                        if match[d] >= 0))
        # the wrapper's solution reconstructs the scipy objective:
        # matched pairs contribute -iou, the k - card disallowed slots
        # it filtered out contribute +1e-3 each
        k = min(iou.shape)
        achieved = -tot + (k - card) * 1e-3
        assert achieved == pytest.approx(_brute_objective(iou, thr),
                                         abs=1e-12)
        return card, tot

    def test_exact_ties_and_duplicates(self):
        # two identical dets on one gt + a det tied across both gts:
        # optimum is 2 matches totalling 0.6 + 0.9 whichever twin wins
        iou = np.array([[0.6, 0.6],
                        [0.6, 0.6],
                        [0.0, 0.9]])
        card, tot = self._check(iou, 0.5)
        assert card == 2
        assert tot == pytest.approx(1.5)

    def test_greedy_trap(self):
        # det0 alone prefers gt1 (0.80) but the optimum sends det0 to
        # gt0 so det1 can take gt1: total 1.25, both matched — a
        # score-ordered greedy would strand det1
        iou = np.array([[0.55, 0.80],
                        [0.00, 0.70]])
        card, tot = self._check(iou, 0.5)
        assert card == 2
        assert tot == pytest.approx(1.25)

    def test_random_dense(self):
        rng = np.random.RandomState(17)
        for _ in range(40):
            n_det, n_gt = rng.randint(1, 5), rng.randint(1, 5)
            iou = rng.rand(n_det, n_gt)
            iou[rng.rand(n_det, n_gt) < 0.4] = 0.0
            self._check(iou, 0.45)

    def test_duplicate_det_is_fp_in_protocol(self):
        """Two perfect duplicate dets on one gt: the protocol counts the
        loser as an FP, so the lower cutoff's precision drops to 0.5 and
        the envelope keeps AP at the single-recall-point value 0.05."""
        gts = {"f0": {"gt_boxes": np.array([_box(0, 0)]),
                      "gt_classes": np.array([0]),
                      "num_points": np.array([10]),
                      "difficulty": np.array([0])}}
        dets = {"f0": {"box3d_lidar": np.array([_box(0, 0), _box(0, 0)]),
                       "scores": np.array([0.9, 0.8]),
                       "label_preds": np.array([0, 0])}}
        m = waymo_official_metrics(dets, gts, ["Vehicle"])
        assert m["AP/L2/Vehicle"] == pytest.approx(0.05)


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

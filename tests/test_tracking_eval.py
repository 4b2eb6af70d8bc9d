import numpy as np

from partner_tpu.eval.seg_metrics import PanopticEval, fast_hist, per_class_iou
from partner_tpu.eval.tracking import greedy_assignment, nusc_tracker, waymo_tracker


def det(x, y, vx=0.0, vy=0.0, name="VEHICLE", score=0.9):
    return {
        "translation": [x, y, 0.0],
        "velocity": [vx, vy],
        "detection_name": name,
        "score": score,
    }


class TestGreedyTracker:
    def test_stable_ids_for_moving_object(self):
        tr = waymo_tracker(score_thresh=0.5)
        # object moving +x at 10 m/s, frames 0.1 s apart
        ids = []
        for t in range(5):
            out = tr.step([det(10 + t * 1.0, 5.0, vx=10.0)], time_lag=0.1)
            assert len(out) == 1
            ids.append(out[0]["tracking_id"])
        assert len(set(ids)) == 1

    def test_new_object_gets_new_id(self):
        tr = waymo_tracker(score_thresh=0.5)
        a = tr.step([det(10, 0)], 0.1)[0]["tracking_id"]
        out = tr.step([det(10, 0), det(40, 20)], 0.1)
        ids = {o["tracking_id"] for o in out}
        assert a in ids and len(ids) == 2

    def test_class_gate(self):
        tr = waymo_tracker(score_thresh=0.5)
        tr.step([det(10, 0, name="VEHICLE")], 0.1)
        out = tr.step([det(10, 0, name="PEDESTRIAN")], 0.1)
        # new id: class mismatch prevents association
        assert out[0]["tracking_id"] == 2

    def test_track_coasts_through_missed_frame(self):
        tr = waymo_tracker(score_thresh=0.5, max_age=3)
        id0 = tr.step([det(10, 0)], 0.1)[0]["tracking_id"]
        tr.step([], 0.1)  # dropout frame
        out = tr.step([det(10, 0)], 0.1)
        assert out[0]["tracking_id"] == id0

    def test_greedy_assignment_order(self):
        dist = np.array([[1.0, 5.0], [2.0, 0.5]])
        m = greedy_assignment(dist)
        assert m.tolist() == [[0, 0], [1, 1]]

    def test_nusc_tracker_names(self):
        tr = nusc_tracker()
        out = tr.step([det(5, 5, name="car", score=0.8)], 0.5)
        assert len(out) == 1


class TestSegMetrics:
    def test_fast_hist_iou(self):
        pred = np.array([0, 1, 1, 2, 2, 2])
        gt = np.array([0, 1, 2, 2, 2, 1])
        hist = fast_hist(pred, gt, 3)
        iou = per_class_iou(hist)
        assert iou[0] == 1.0
        np.testing.assert_allclose(iou[2], 2 / 4)

    def test_panoptic_perfect(self):
        pe = PanopticEval(3, ignore=[0], min_points=1)
        sem = np.array([1] * 60 + [2] * 60)
        inst = np.array([1] * 30 + [2] * 30 + [0] * 60)
        pe.addBatch(sem, inst, sem, inst)
        pq, sq, rq, *_ = pe.getPQ()
        assert pq == 1.0 and sq == 1.0 and rq == 1.0
        miou, _ = pe.getSemIoU()
        assert miou == 1.0

    def test_panoptic_split_instance(self):
        pe = PanopticEval(2, ignore=[], min_points=1)
        sem = np.ones(100, np.int64)
        gt_inst = np.ones(100, np.int64)
        pred_inst = np.array([1] * 50 + [2] * 50)
        pe.addBatch(sem.copy(), pred_inst, sem.copy(), gt_inst)
        pq, sq, rq, *_ = pe.getPQ()
        assert pq < 1.0  # split instance costs PQ


class TestMota:
    def _frames(self):
        # 2 GT objects over 3 frames; ids 10, 11
        gt = {}
        for fi in range(3):
            gt[f"s_frame_{fi}"] = {
                "centers": np.array([[10.0 + fi, 0.0, 0.0],
                                     [0.0, 20.0 - fi, 0.0]], np.float32),
                "labels": np.array([0, 0]),
                "ids": np.array([10, 11]),
            }
        return gt

    def test_perfect_tracking_mota_1(self):
        from partner_tpu.eval.tracking import mota_evaluate

        gt = self._frames()
        results = {
            tok: {"tracking_ids": np.array([1, 2]),
                  "boxes_global": g["centers"],
                  "labels": g["labels"],
                  "scores": np.ones(2, np.float32)}
            for tok, g in gt.items()
        }
        m = mota_evaluate(results, gt)
        assert m["mota"] == 1.0 and m["num_gt"] == 6
        assert m["id_switches"] == 0

    def test_counts_miss_fp_idsw(self):
        from partner_tpu.eval.tracking import mota_evaluate

        gt = self._frames()
        results = {}
        for fi, (tok, g) in enumerate(gt.items()):
            if fi == 0:
                # both matched, ids 1/2
                results[tok] = {"tracking_ids": np.array([1, 2]),
                                "boxes_global": g["centers"],
                                "labels": g["labels"]}
            elif fi == 1:
                # first object switches to id 3; second missed; one FP far away
                results[tok] = {
                    "tracking_ids": np.array([3, 4]),
                    "boxes_global": np.stack(
                        [g["centers"][0], np.array([50.0, 50, 0])]),
                    "labels": np.array([0, 0])}
            else:
                results[tok] = {"tracking_ids": np.array([3, 2]),
                                "boxes_global": g["centers"],
                                "labels": g["labels"]}
        m = mota_evaluate(results, gt)
        assert m["misses"] == 1          # obj 11 in frame 1
        assert m["false_positives"] == 1  # far box in frame 1
        assert m["id_switches"] == 1      # obj 10: id 1 -> 3 (3 stays in f2)
        assert abs(m["mota"] - (1 - 3 / 6)) < 1e-9

    def test_wrong_class_never_matches(self):
        from partner_tpu.eval.tracking import mota_evaluate

        gt = {"t0": {"centers": np.array([[5.0, 5.0, 0.0]], np.float32),
                     "labels": np.array([0]), "ids": np.array([7])}}
        results = {"t0": {"tracking_ids": np.array([1]),
                          "boxes_global": np.array([[5.0, 5.0, 0.0]]),
                          "labels": np.array([1])}}
        m = mota_evaluate(results, gt)
        assert m["misses"] == 1 and m["false_positives"] == 1

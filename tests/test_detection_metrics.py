"""Detection AP/APH + nuScenes-style mAP/NDS against hand-computed cases."""

import numpy as np
import pytest

from partner_tpu.eval import detection_metrics as dm


def box7(x, y, yaw=0.0, dx=4.0, dy=2.0):
    return [x, y, 0.0, dx, dy, 1.5, yaw]


class TestNumpyIoU:
    def test_matches_jax_green_kernel(self, rng):
        import jax.numpy as jnp
        from partner_tpu.ops import rotated_iou

        boxes = np.zeros((30, 5), np.float32)
        boxes[:, :2] = rng.uniform(-5, 5, (30, 2))
        boxes[:, 2:4] = rng.uniform(0.5, 5, (30, 2))
        boxes[:, 4] = rng.uniform(-np.pi, np.pi, 30)
        a, b = boxes[:15], boxes[15:]
        want = np.asarray(rotated_iou.rect_intersection_area_green(
            jnp.asarray(a)[:, None, :].repeat(15, 1),
            jnp.asarray(b)[None, :, :].repeat(15, 0)))
        got = dm.rect_intersection_area_np(a[:, None, :], b[None, :, :])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestWaymoAP:
    def test_perfect_detections(self):
        gt = {"t0": {"gt_boxes": np.array([box7(0, 0), box7(10, 0)]),
                     "gt_classes": np.array([0, 0])}}
        det = {"t0": {"box3d_lidar": np.array([box7(0, 0), box7(10, 0)]),
                      "scores": np.array([0.9, 0.8]),
                      "label_preds": np.array([0, 0])}}
        m = dm.waymo_ap_aph(det, gt, ["Vehicle"])
        assert m["AP/Vehicle"] == pytest.approx(1.0)
        assert m["APH/Vehicle"] == pytest.approx(1.0)

    def test_half_recall(self):
        gt = {"t0": {"gt_boxes": np.array([box7(0, 0), box7(10, 0)]),
                     "gt_classes": np.array([0, 0])}}
        det = {"t0": {"box3d_lidar": np.array([box7(0, 0)]),
                      "scores": np.array([0.9]),
                      "label_preds": np.array([0])}}
        m = dm.waymo_ap_aph(det, gt, ["Vehicle"])
        # all-point AP: precision 1 up to recall 0.5 -> AP = 0.5
        assert m["AP/Vehicle"] == pytest.approx(0.5)

    def test_false_positive_after_tp(self):
        gt = {"t0": {"gt_boxes": np.array([box7(0, 0)]),
                     "gt_classes": np.array([0])}}
        det = {"t0": {"box3d_lidar": np.array([box7(0, 0), box7(50, 50)]),
                      "scores": np.array([0.9, 0.8]),
                      "label_preds": np.array([0, 0])}}
        m = dm.waymo_ap_aph(det, gt, ["Vehicle"])
        # TP first (prec 1 @ rec 1), FP after doesn't reduce the envelope
        assert m["AP/Vehicle"] == pytest.approx(1.0)

    def test_heading_error_halves_aph(self):
        gt = {"t0": {"gt_boxes": np.array([box7(0, 0, yaw=0.0, dx=4, dy=4)]),
                     "gt_classes": np.array([0])}}
        # pi rotation on a square box: IoU 1 but heading off by pi -> APH 0
        det = {"t0": {"box3d_lidar": np.array(
                        [box7(0, 0, yaw=np.pi, dx=4, dy=4)]),
                      "scores": np.array([0.9]),
                      "label_preds": np.array([0])}}
        m = dm.waymo_ap_aph(det, gt, ["Vehicle"])
        assert m["AP/Vehicle"] == pytest.approx(1.0)
        assert m["APH/Vehicle"] == pytest.approx(0.0, abs=1e-6)

    def test_low_iou_is_fp(self):
        gt = {"t0": {"gt_boxes": np.array([box7(0, 0)]),
                     "gt_classes": np.array([0])}}
        det = {"t0": {"box3d_lidar": np.array([box7(3.0, 1.5)]),
                      "scores": np.array([0.9]),
                      "label_preds": np.array([0])}}
        m = dm.waymo_ap_aph(det, gt, ["Vehicle"])
        assert m["AP/Vehicle"] == pytest.approx(0.0)


class TestNuscMapNds:
    def test_perfect(self):
        gt = {"t0": {"gt_boxes": np.array(
                        [box7(0, 0) + [0, 0], box7(10, 0) + [0, 0]])[:, :9],
                     "gt_classes": np.array([0, 0])}}
        # 9-dim boxes: [x,y,z,dx,dy,dz,vx,vy,yaw]
        b = np.zeros((2, 9)); b[0, :3] = [0, 0, 0]; b[1, :3] = [10, 0, 0]
        b[:, 3:6] = [4, 2, 1.5]
        g = {"t0": {"gt_boxes": b, "gt_classes": np.array([0, 0])}}
        det = {"t0": {"box3d_lidar": b.copy(),
                      "scores": np.array([0.9, 0.8]),
                      "label_preds": np.array([0, 0])}}
        m = dm.nusc_map_nds(det, g, ["car"])
        assert m["mAP"] == pytest.approx(1.0)
        assert m["ATE"] == pytest.approx(0.0, abs=1e-6)
        assert m["ASE"] == pytest.approx(0.0, abs=1e-6)
        assert m["NDS"] == pytest.approx(1.0)

    def test_translation_error_reported(self):
        b = np.zeros((1, 9)); b[:, 3:6] = [4, 2, 1.5]
        g = {"t0": {"gt_boxes": b, "gt_classes": np.array([0])}}
        d = b.copy(); d[0, 0] = 1.0  # 1 m off
        det = {"t0": {"box3d_lidar": d, "scores": np.array([0.9]),
                      "label_preds": np.array([0])}}
        m = dm.nusc_map_nds(det, g, ["car"])
        # matched at 1/2/4 m but not 0.5 m -> mAP = 3/4
        assert m["mAP"] == pytest.approx(0.75)
        assert m["ATE"] == pytest.approx(1.0, abs=1e-6)


class TestDatasetEvaluationWiring:
    def test_nusc_evaluation_returns_all_three(self, rng, tmp_path):
        from partner_tpu.data.datasets import NuScenesDataset
        import pickle

        b = np.zeros((1, 9)); b[:, 3:6] = [4, 2, 1.5]
        infos = [{"token": "t0", "gt_boxes": b, "gt_names": ["car"],
                  "timestamp": 0}]
        info_path = tmp_path / "infos.pkl"
        with open(info_path, "wb") as f:
            pickle.dump(infos, f)
        ds = NuScenesDataset(str(tmp_path), str(info_path),
                             class_names=["car"])
        det = {"t0": {"box3d_lidar": b.copy(), "scores": np.array([0.9]),
                      "label_preds": np.array([0]),
                      "metadata": {"token": "t0"}}}
        seg = {"t0": {"pred": np.array([1, 2, 3, 3]),
                      "gt": np.array([1, 2, 3, 1])}}
        ins = {"t0": {"pred_sem": np.ones(200, np.int64),
                      "pred_inst": np.r_[np.zeros(100), np.ones(100)].astype(np.int64),
                      "gt_sem": np.ones(200, np.int64),
                      "gt_inst": np.r_[np.zeros(100), np.ones(100)].astype(np.int64)}}
        dets_m, miou, pq = ds.evaluation(
            det, output_dir=str(tmp_path), final_seg=seg, final_ins=ins)
        assert dets_m is not None and dets_m["mAP"] == pytest.approx(1.0)
        assert miou is not None and 0 < miou <= 1
        # PQ averages over all 16 non-ignore classes; only class 1 has data
        assert pq is not None and pq["PQ"] == pytest.approx(1.0 / 16)

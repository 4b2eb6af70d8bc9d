"""Tracking CLI: synthetic moving objects get consistent track ids."""

import os
import pickle
import subprocess
import sys

import numpy as np

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


class TestTrackCLI:
    def test_consistent_ids_on_linear_motion(self, rng, tmp_path):
        import track

        # two vehicles moving linearly over 5 frames, one sequence
        detections, infos = {}, []
        for fi in range(5):
            tok = f"seq_0_frame_{fi}"
            boxes = np.zeros((2, 9), np.float32)
            boxes[0, :2] = [10 + 2 * fi, 5]
            boxes[1, :2] = [-20, -3 - 1.5 * fi]
            boxes[:, 3:6] = [4, 2, 1.6]
            boxes[0, 6:8] = [2.0, 0.0]   # vx, vy per unit time
            boxes[1, 6:8] = [0.0, -1.5]
            detections[tok] = {
                "box3d_lidar": boxes,
                "scores": np.array([0.9, 0.85], np.float32),
                "label_preds": np.array([0, 0]),
            }
            infos.append({"token": tok, "timestamp": float(fi),
                          "pose": np.eye(4)})

        out = track.run_tracking(detections, infos, dataset="waymo")
        assert len(out) == 5
        # each frame has 2 active tracks with stable ids
        ids0 = sorted(out["seq_0_frame_0"]["tracking_ids"].tolist())
        for fi in range(5):
            r = out[f"seq_0_frame_{fi}"]
            assert len(r["tracking_ids"]) == 2
            assert sorted(r["tracking_ids"].tolist()) == ids0

        # CLI end-to-end: writes tracking_result.pkl
        pred = tmp_path / "prediction.pkl"
        info_p = tmp_path / "infos.pkl"
        with open(pred, "wb") as f:
            pickle.dump(detections, f)
        with open(info_p, "wb") as f:
            pickle.dump(infos, f)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the subprocess off the
        # remote-TPU plugin (sitecustomize overrides JAX_PLATFORMS)
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "track.py"),
             "--prediction", str(pred), "--info_path", str(info_p),
             "--work_dir", str(tmp_path / "out")],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr[-500:]
        with open(tmp_path / "out" / "tracking_result.pkl", "rb") as f:
            res = pickle.load(f)
        assert len(res) == 5


class TestLineSearchCLI:
    def test_grid_search_finds_working_gate(self, rng, tmp_path):
        detections, infos, gt = {}, [], {}
        for fi in range(4):
            tok = f"seq_0_frame_{fi}"
            boxes = np.zeros((1, 9), np.float32)
            boxes[0, :2] = [10 + 2 * fi, 5]
            boxes[:, 3:6] = [4, 2, 1.6]
            boxes[0, 6:8] = [2.0, 0.0]
            detections[tok] = {
                "box3d_lidar": boxes,
                "scores": np.array([0.9], np.float32),
                "label_preds": np.array([0]),
            }
            infos.append({"token": tok, "timestamp": float(fi),
                          "pose": np.eye(4)})
            gt[tok] = {"centers": boxes[:, :3].copy(),
                       "labels": np.array([0]), "ids": np.array([42])}

        paths = {}
        for name, obj in [("prediction", detections), ("infos", infos),
                          ("gt", gt)]:
            paths[name] = tmp_path / f"{name}.pkl"
            with open(paths[name], "wb") as f:
                pickle.dump(obj, f)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "track_line_search.py"),
             "--prediction", str(paths["prediction"]),
             "--info_path", str(paths["infos"]),
             "--gt_path", str(paths["gt"]),
             "--scores", "0.5:0.8:0.3", "--dists", "1.0:3.0:2.0"],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr[-500:]
        assert "best: MOTA 1.0000" in r.stdout, r.stdout[-500:]

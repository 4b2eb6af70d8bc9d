"""Ensemble NMS + multi-sweep inference tools + dist single-host."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


class TestEnsembleNMS:
    def test_duplicates_across_models_collapse(self, rng):
        import nms_ensemble

        b = np.zeros((2, 7), np.float32)
        b[:, :2] = [[5, 0], [0, 8]]
        b[:, 3:6] = [4, 2, 1.6]
        pa = {"t0": {"box3d_lidar": b, "scores": np.array([0.9, 0.8]),
                     "label_preds": np.array([0, 0])}}
        bb = b.copy(); bb[:, 0] += 0.05
        pb = {"t0": {"box3d_lidar": bb, "scores": np.array([0.7, 0.95]),
                     "label_preds": np.array([0, 0])}}
        out = nms_ensemble.ensemble([pa, pb], iou=0.5, post=10)
        assert len(out["t0"]["scores"]) == 2  # 4 boxes -> 2 objects

    def test_weighting(self, rng):
        import nms_ensemble

        b = np.zeros((1, 7), np.float32); b[0, 3:6] = [4, 2, 1.6]
        pa = {"t0": {"box3d_lidar": b, "scores": np.array([1.0]),
                     "label_preds": np.array([0])}}
        out = nms_ensemble.ensemble([pa], weights=[0.5])
        assert out["t0"]["scores"][0] == pytest.approx(0.5)


class TestMultiSweepCLI:
    def test_runs_on_synthetic_frames(self, rng, tmp_path):
        # synthetic waymo-like frames with poses moving forward
        infos = []
        for fi in range(4):
            n = 3000
            pts = rng.uniform(-40, 40, (n, 5)).astype(np.float32)
            pose = np.eye(4); pose[0, 3] = 2.0 * fi
            infos.append({"token": f"seq_0_frame_{fi}", "timestamp": float(fi),
                          "points": pts, "pose": pose})
        info_p = tmp_path / "infos.pkl"
        with open(info_p, "wb") as f:
            pickle.dump(infos, f)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        # sitecustomize force-registers the remote-TPU plugin when this is
        # set, overriding JAX_PLATFORMS — the CPU subprocess must never
        # depend on the tunnel being up
        env.pop("PALLAS_AXON_POOL_IPS", None)
        cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                           "tests", "tiny_synthetic.py")
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "multi_sweep_inference.py"),
             cfg, "--info_path", str(info_p), "--nsweeps", "3",
             "--max_points", "20000", "--work_dir", str(tmp_path / "o")],
            capture_output=True, text=True, env=env, timeout=560)
        assert r.returncode == 0, r.stderr[-800:]
        with open(tmp_path / "o" / "prediction.pkl", "rb") as f:
            dets = pickle.load(f)
        assert len(dets) == 4


class TestInstanceIds:
    def test_points_in_boxes_get_box_ids(self, rng):
        import generate_instance_ids as gii

        boxes = np.array([[5, 0, 0, 4, 2, 1.6, 0.0],
                          [-6, 3, 0, 4, 2, 1.6, 1.0]], np.float32)
        def in_box(b, n=50):
            local = (rng.rand(n, 3) - 0.5) * b[3:6] * 0.8
            c, s_ = np.cos(b[6]), np.sin(b[6])
            rot = local.copy()
            rot[:, 0] = local[:, 0] * c - local[:, 1] * s_
            rot[:, 1] = local[:, 0] * s_ + local[:, 1] * c
            return rot + b[:3]

        pts = np.concatenate([
            in_box(boxes[0]), in_box(boxes[1]),
            rng.uniform(20, 40, (100, 3)),
        ]).astype(np.float32)
        labels = np.ones(len(pts), np.int64)
        inst = gii.instance_ids_for_frame(pts, labels, boxes, [1])
        assert set(inst[:50]) == {1}
        assert set(inst[50:100]) == {2}
        assert set(inst[100:]) == {0}


class TestSingleInference:
    def test_file_transport_once(self, rng, tmp_path):
        """single_inference --once consumes .bin/.npy frames and writes
        .det.npz results (the ROS node's file stand-in)."""
        import single_inference as si

        from partner_tpu.train.config import Config

        n = 2000
        pts = np.stack([rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
                        rng.uniform(-1.5, 2.5, n), rng.rand(n)],
                       1).astype(np.float32)
        pts.tofile(str(tmp_path / "f0.bin"))
        np.save(str(tmp_path / "f1.npy"), pts)

        cfg = Config.fromfile(
            os.path.join(os.path.dirname(TOOLS), "configs/tests/"
                         "tiny_synthetic.py"))
        variables, predict, meta = si.build_predictor(cfg, max_points=8192)
        det = si.run_frame(variables, predict, meta, pts,
                           score_threshold=0.0)
        assert det["box3d_lidar"].shape[-1] in (7, 9)
        assert np.isfinite(det["scores"]).all()

        class A:
            watch_dir = str(tmp_path); once = True; poll = 0.01
            checkpoint = None; score = 0.0; max_points = 8192
        si._file_loop(A, cfg)
        assert (tmp_path / "f0.det.npz").exists()
        assert (tmp_path / "f1.det.npz").exists()


class TestMetricsSinkHook:
    def test_jsonl_sink_and_interval(self, tmp_path):
        import json

        from partner_tpu.train.hooks import ClosureHook, MetricsSinkHook

        p = str(tmp_path / "metrics.jsonl")
        h = MetricsSinkHook(path=p, interval=2)
        h.log(0, {"loss": 1.5, "hm_loss": 0.7}, lr=3e-3, epoch=0)
        h.log(1, {"loss": 1.4})          # skipped (interval)
        h.log(2, {"loss": 1.3, "bad": object()})
        h.close()
        recs = [json.loads(l) for l in open(p)]
        assert [r["step"] for r in recs] == [0, 2]
        assert recs[0]["lr"] == 3e-3 and recs[0]["hm_loss"] == 0.7
        assert "bad" not in recs[1]

        seen = []
        h2 = MetricsSinkHook(sink=seen.append, interval=1)
        h2.log(7, {"loss": 0.5})
        assert seen == [{"step": 7, "loss": 0.5}]

        calls = []
        ch = ClosureHook("after_iter", lambda t: calls.append(t))
        ch.after_iter(42)
        assert calls == [42]

"""nuScenes results-json writer: devkit schema + global-frame golden.

The devkit's `submission` spec requires meta with exactly the five use_*
booleans and per-box `sample_result` entries with exactly eight keys;
boxes must be in the GLOBAL frame (lidar -> ego -> global through the
calibrated_sensor and ego_pose quaternions — CenterPoint's
lidar_nusc_box_to_global). VERDICT r4 next #8 (nusc half)."""

import json
import os

import numpy as np
import pytest

SAMPLE_RESULT_KEYS = {
    "sample_token", "translation", "size", "rotation", "velocity",
    "detection_name", "detection_score", "attribute_name",
}
META_KEYS = {"use_camera", "use_lidar", "use_radar", "use_map",
             "use_external"}


def _det(boxes):
    return {
        "box3d_lidar": np.asarray(boxes, np.float32),
        "scores": np.linspace(0.9, 0.5, len(boxes)).astype(np.float32),
        "label_preds": np.zeros((len(boxes),), np.int64),
    }


class TestNuscResultsSchema:
    def test_schema_keys_exact(self, tmp_path):
        from partner_tpu.eval.nuscenes import write_nusc_results

        boxes = [[1.0, 2.0, 0.5, 1.9, 4.6, 1.7, 0.1, -0.2, 0.3]]
        path = write_nusc_results({"tok0": _det(boxes)}, [],
                                  str(tmp_path), ["car"])
        with open(path) as f:
            sub = json.load(f)
        assert set(sub) == {"meta", "results"}
        assert set(sub["meta"]) == META_KEYS
        assert sub["meta"]["use_lidar"] is True
        assert not sub["meta"]["use_camera"]
        (entry,) = sub["results"]["tok0"]
        assert set(entry) == SAMPLE_RESULT_KEYS
        assert len(entry["translation"]) == 3
        assert len(entry["size"]) == 3
        assert len(entry["rotation"]) == 4
        assert len(entry["velocity"]) == 2
        # unit quaternion
        assert abs(np.linalg.norm(entry["rotation"]) - 1) < 1e-9
        assert entry["detection_name"] == "car"
        assert entry["attribute_name"] == "vehicle.parked"

    def test_no_calibration_stays_lidar_frame(self, tmp_path):
        from partner_tpu.eval.nuscenes import write_nusc_results

        boxes = [[3.0, -1.0, 0.2, 2.0, 5.0, 1.8, 0.0, 0.0, np.pi / 2]]
        path = write_nusc_results(
            {"tok0": _det(boxes)},
            [{"token": "tok0"}],  # info without calibration keys
            str(tmp_path), ["car"])
        (entry,) = json.load(open(path))["results"]["tok0"]
        np.testing.assert_allclose(entry["translation"], [3.0, -1.0, 0.2],
                                   atol=1e-6)
        # yaw pi/2 -> quaternion [cos(pi/4), 0, 0, sin(pi/4)]
        np.testing.assert_allclose(
            entry["rotation"], [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
            atol=1e-7)

    def test_global_frame_golden(self, tmp_path):
        """Hand-computed lidar -> ego -> global chain: identity
        lidar2ego, ego yaw +90 deg with translation (100, 50, 0)."""
        from partner_tpu.eval.nuscenes import write_nusc_results

        s2 = np.sqrt(0.5)
        info = {
            "token": "tok0",
            "lidar2ego_rotation": [1.0, 0.0, 0.0, 0.0],
            "lidar2ego_translation": [0.0, 0.0, 1.8],
            "ego2global_rotation": [s2, 0.0, 0.0, s2],   # yaw +90 deg
            "ego2global_translation": [100.0, 50.0, 0.0],
        }
        # lidar box at (10, 0, 0), yaw 0, velocity (+1, 0)
        boxes = [[10.0, 0.0, 0.0, 2.0, 5.0, 1.8, 1.0, 0.0, 0.0]]
        path = write_nusc_results({"tok0": _det(boxes)}, [info],
                                  str(tmp_path), ["car"])
        (entry,) = json.load(open(path))["results"]["tok0"]
        # ego frame: (10, 0, 1.8); global: rot90 -> (0, 10) + (100, 50)
        np.testing.assert_allclose(entry["translation"],
                                   [100.0, 60.0, 1.8], atol=1e-9)
        # yaw 0 + 90 deg ego yaw -> global yaw 90 deg
        np.testing.assert_allclose(entry["rotation"], [s2, 0, 0, s2],
                                   atol=1e-9)
        # velocity rotates: (1, 0) -> (0, 1)
        np.testing.assert_allclose(entry["velocity"], [0.0, 1.0],
                                   atol=1e-9)

    def test_create_data_passes_calibration_through(self, tmp_path):
        import pickle
        import sys

        sys.path.insert(0, "/root/repo/tools")
        import create_data

        frames = [{
            "token": "t0", "lidar_path": "x.bin", "timestamp": 7,
            "gt_boxes": np.zeros((0, 9), np.float32),
            "gt_names": np.array([]),
            "lidar2ego_rotation": [1.0, 0, 0, 0],
            "lidar2ego_translation": [0.0, 0, 1.8],
            "ego2global_rotation": [0.0, 0, 0, 1.0],
            "ego2global_translation": [5.0, 6, 0],
        }]
        fp = tmp_path / "frames.pkl"
        with open(fp, "wb") as f:
            pickle.dump(frames, f)
        out = create_data.nuscenes_data_prep(str(tmp_path),
                                             version="v1.0-mini-val",
                                             nsweeps=1, frames_pkl=str(fp))
        (info,) = pickle.load(open(out, "rb"))
        assert info["lidar2ego_translation"] == [0.0, 0, 1.8]
        assert info["ego2global_translation"] == [5.0, 6, 0]

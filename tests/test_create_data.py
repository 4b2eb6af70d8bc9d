"""create_data round trip: raw frames -> infos -> gt database -> GT-AUG."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import create_data  # noqa: E402


def _write_waymo_fixture(root, rng, n_frames=3):
    """Fake converted waymo frames: a couple of dense box clusters + noise."""
    os.makedirs(os.path.join(root, "train", "lidar"), exist_ok=True)
    os.makedirs(os.path.join(root, "train", "annos"), exist_ok=True)
    boxes_per_frame = []
    for fi in range(n_frames):
        boxes = np.zeros((2, 9), np.float32)
        boxes[:, 0] = [10 + 9 * fi, -8 - 7 * fi]
        boxes[:, 1] = [5 + 8 * fi, 12 - 9 * fi]
        boxes[:, 2] = 0.5
        boxes[:, 3:6] = [4.0, 2.0, 1.6]
        boxes[:, -1] = [0.3, -1.2]
        pts = []
        for b in boxes:
            local = (rng.rand(200, 3) - 0.5) * b[3:6] * 0.9
            c, s = np.cos(b[-1]), np.sin(b[-1])
            rot = local.copy()
            rot[:, 0] = local[:, 0] * c - local[:, 1] * s
            rot[:, 1] = local[:, 0] * s + local[:, 1] * c
            pts.append(rot + b[:3])
        pts.append(rng.uniform(-30, 30, (500, 3)).astype(np.float32))
        xyz = np.concatenate(pts).astype(np.float32)
        feat = rng.rand(len(xyz), 2).astype(np.float32)
        frame = {"lidars": {"points_xyz": xyz, "points_feature": feat}}
        name = f"seq_0_frame_{fi}.pkl"
        with open(os.path.join(root, "train", "lidar", name), "wb") as f:
            pickle.dump(frame, f)
        anno = {"objects": [
            {"box": b, "name": "Vehicle", "num_points": 200, "difficulty": 0}
            for b in boxes
        ], "frame_name": name}
        with open(os.path.join(root, "train", "annos", name), "wb") as f:
            pickle.dump(anno, f)
        boxes_per_frame.append(boxes)
    return boxes_per_frame


class TestCreateDataRoundTrip:
    def test_infos_db_and_gt_aug(self, rng, tmp_path):
        root = str(tmp_path)
        _write_waymo_fixture(root, rng)

        info_path = create_data.waymo_data_prep(root, "train", nsweeps=1)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == 3
        assert infos[0]["gt_boxes"].shape == (2, 9)
        assert list(infos[0]["gt_names"]) == ["Vehicle", "Vehicle"]

        db_path = create_data.create_groundtruth_database(
            "WaymoDataset", root, info_path)
        with open(db_path, "rb") as f:
            db = pickle.load(f)
        assert "Vehicle" in db and len(db["Vehicle"]) == 6
        e = db["Vehicle"][0]
        assert e["num_points_in_gt"] >= 150
        pts = np.fromfile(os.path.join(root, e["path"]),
                          np.float32).reshape(-1, 5)
        # object-frame points stay within the box extents
        assert np.abs(pts[:, :2]).max() < np.hypot(2.0, 1.0) + 0.1

        # GT-AUG consumes the db through the Preprocess pipeline stage
        from partner_tpu.data.pipeline import Preprocess

        pre = Preprocess(cfg=dict(
            mode="train", shuffle_points=False,
            class_names=["Vehicle"], voxel_shape="cuboid",
            db_sampler=dict(
                enable=True, db_info_path=db_path,
                sample_groups=[dict(Vehicle=8)],
                db_prep_steps=[
                    dict(filter_by_min_num_points=dict(Vehicle=5))],
                rate=1.0),
        ))
        res = {
            "mode": "train",
            "metadata": {"image_prefix": root, "num_point_features": 5},
            "voxel_shape": "cuboid",
            "lidar": {
                "points": rng.uniform(-30, 30, (400, 5)).astype(np.float32),
                "annotations": {
                    "boxes": infos[0]["gt_boxes"].astype(np.float32),
                    "names": infos[0]["gt_names"],
                },
            },
        }
        res, _ = pre(res, infos[0])
        gt = res["lidar"]["annotations"]
        # 2 originals + sampled up to 8 vehicles (minus collision rejects)
        assert len(gt["gt_boxes"]) > 2
        assert len(res["lidar"]["points"]) > 400

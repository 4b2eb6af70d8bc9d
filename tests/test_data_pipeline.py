import pickle

import numpy as np
import pytest

from partner_tpu.data import augment, build_dataset, collate as collate_mod
from partner_tpu.data.collate import collate
from partner_tpu.data.loader import DataLoader, EpochSampler

PR = [0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8]
VS = [(PR[3] - PR[0]) / 64, (PR[4] - PR[1]) / 128, (PR[5] - PR[2]) / 24]


def make_waymo_infos(tmp_path, n=4, seed=0):
    rng = np.random.RandomState(seed)
    infos = []
    for i in range(n):
        npts = rng.randint(3000, 5000)
        r = rng.uniform(1, 34, npts)
        th = rng.uniform(-np.pi, np.pi, npts)
        pts = np.stack(
            [r * np.cos(th), r * np.sin(th), rng.uniform(-1.5, 2.5, npts),
             rng.uniform(0, 1, npts), rng.uniform(0, 1, npts)], 1
        ).astype(np.float32)
        nb = rng.randint(1, 5)
        boxes = np.zeros((nb, 9), np.float32)
        rho = rng.uniform(5, 30, nb)
        phi = rng.uniform(-2.5, 2.5, nb)
        boxes[:, 0] = rho * np.cos(phi)
        boxes[:, 1] = rho * np.sin(phi)
        boxes[:, 2] = rng.uniform(-0.5, 0.5, nb)
        boxes[:, 3:6] = rng.uniform(1.5, 5, (nb, 3))
        boxes[:, -1] = rng.uniform(-np.pi, np.pi, nb)
        infos.append({
            "token": f"frame{i}",
            "points": pts,
            "gt_boxes": boxes,
            "gt_names": np.array(["Vehicle"] * nb),
        })
    path = str(tmp_path / "infos.pkl")
    with open(path, "wb") as f:
        pickle.dump(infos, f)
    return path


def pipeline_cfg(mode="train"):
    assigner = dict(
        target_assigner=dict(tasks=[dict(num_class=1,
                                         class_names=["Vehicle"])]),
        out_size_factor=8, gaussian_overlap=0.1, max_objs=32, min_radius=2,
        voxel_shape="cylinder",
    )
    vg = dict(range=PR, voxel_size=VS, max_points_in_voxel=5,
              max_voxel_num=20000, voxel_shape="cylinder")
    prep = dict(
        mode=mode, shuffle_points=True,
        global_rot_noise=[-0.78, 0.78], global_scale_noise=[0.95, 1.05],
        db_sampler=dict(enable=False), class_names=["Vehicle"],
        voxel_shape="cylinder",
    )
    return [
        dict(type="LoadPointCloudFromFile", dataset="WaymoDataset"),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
        dict(type="Preprocess", cfg=prep),
        dict(type="Voxelization", cfg=vg),
        dict(type="AssignLabel", cfg=assigner),
        dict(type="Reformat"),
    ]


class TestPipeline:
    def test_end_to_end_sample(self, tmp_path):
        info_path = make_waymo_infos(tmp_path)
        ds = build_dataset(dict(
            type="WaymoDataset", root_path=str(tmp_path),
            info_path=info_path, pipeline=pipeline_cfg(), nsweeps=1,
            class_names=["Vehicle"],
        ))
        assert len(ds) == 4
        sample = ds[0]
        assert sample["points"].shape[1] == 7  # rho,phi,z,x,y,int,elong
        assert sample["hm"][0].shape == (1, 16, 8)
        assert sample["global_box"].shape == (32, 10)
        assert sample["votemap"].shape == (16, 8, 5)
        # at least one positive target (boxes are placed in range)
        assert sample["mask"][0].sum() >= 1
        # regression targets finite
        assert np.isfinite(sample["anno_box"][0]).all()

    def test_collate_shapes(self, tmp_path):
        info_path = make_waymo_infos(tmp_path)
        ds = build_dataset(dict(
            type="WaymoDataset", root_path=str(tmp_path),
            info_path=info_path, pipeline=pipeline_cfg(), nsweeps=1,
        ))
        batch = collate([ds[0], ds[1]], max_points=8192)
        assert batch["points"].shape == (2, 8192, 7)
        assert batch["points_mask"].sum(1).min() > 1000
        assert batch["hm"][0].shape == (2, 16, 8, 1)
        assert batch["global_box"].shape == (2, 32, 10)
        assert batch["votemap_flat"].shape == (2, 16 * 8, 5)
        assert batch["global_box_mask"].dtype == bool

    def test_loader_iterates(self, tmp_path):
        info_path = make_waymo_infos(tmp_path)
        ds = build_dataset(dict(
            type="WaymoDataset", root_path=str(tmp_path),
            info_path=info_path, pipeline=pipeline_cfg(), nsweeps=1,
        ))
        dl = DataLoader(ds, batch_size=2, num_workers=2, max_points=8192)
        batches = list(dl)
        assert len(batches) == 2
        for b in batches:
            assert b["points"].shape[0] == 2

    def test_val_mode_no_targets(self, tmp_path):
        info_path = make_waymo_infos(tmp_path)
        ds = build_dataset(dict(
            type="WaymoDataset", root_path=str(tmp_path),
            info_path=info_path, pipeline=pipeline_cfg(mode="val"),
            nsweeps=1, mode="val",
        ))
        sample = ds[0]
        assert "hm" not in sample
        assert sample["points"].shape[1] == 7


class TestEpochSampler:
    def test_host_shards_disjoint(self):
        s0 = EpochSampler(100, 4, num_hosts=2, host_id=0)
        s1 = EpochSampler(100, 4, num_hosts=2, host_id=1)
        i0, i1 = s0.indices(3), s1.indices(3)
        assert len(set(i0) & set(i1)) == 0
        assert len(i0) % 4 == 0

    def test_epoch_changes_order(self):
        s = EpochSampler(50, 5)
        assert not np.array_equal(s.indices(0), s.indices(1))


class TestAugment:
    def test_flip_preserves_box_membership(self, rng):
        from partner_tpu.core import box_np_ops

        boxes = np.array([[5.0, 3.0, 0.0, 4.0, 2.0, 1.5, 0.7]], np.float32)
        pts = np.array([[5.2, 3.1, 0.1, 1.0]], np.float32)
        for seed in range(4):
            b, p = boxes.copy(), pts.copy()
            b, p = augment.random_flip_both(b, p,
                                            rng=np.random.RandomState(seed))
            m = box_np_ops.points_in_rbbox(p[:, :3], b)
            assert m[0, 0]

    def test_rotation_preserves_membership(self, rng):
        from partner_tpu.core import box_np_ops

        boxes = np.array([[5.0, 3.0, 0.0, 4.0, 2.0, 1.5, 0.7]], np.float32)
        pts = np.array([[5.5, 3.4, 0.1, 1.0]], np.float32)
        b, p = augment.global_rotation(boxes.copy(), pts.copy(), [0.5, 0.5])
        assert box_np_ops.points_in_rbbox(p[:, :3], b)[0, 0]

    def test_collision_test(self):
        from partner_tpu.core import box_np_ops

        boxes = np.array(
            [[0, 0, 4, 2, 0.0], [1, 0, 4, 2, 0.5], [20, 0, 4, 2, 0.0]],
            np.float32,
        )
        corners = box_np_ops.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 2:4], boxes[:, 4]
        )
        coll = augment.box_collision_test(corners, corners)
        assert coll[0, 1] and coll[1, 0]
        assert not coll[0, 2] and not coll[1, 2]
        assert coll[0, 0]  # self-overlap true (diag filtered by caller)


class TestDoubleFlipStage:
    def test_flip_variants_and_reformat(self, rng):
        from partner_tpu.data.pipeline import DoubleFlip, Reformat

        pts = rng.randn(100, 5).astype(np.float32)
        res = {"mode": "val", "metadata": {"token": "t"},
               "lidar": {"points": pts.copy(), "voxels": {}}}
        res, _ = DoubleFlip()(res, {})
        np.testing.assert_array_equal(res["lidar"]["yflip_points"][:, 1],
                                      -pts[:, 1])
        np.testing.assert_array_equal(res["lidar"]["xflip_points"][:, 0],
                                      -pts[:, 0])
        np.testing.assert_array_equal(
            res["lidar"]["double_flip_points"][:, :2], -pts[:, :2])
        # untouched columns
        np.testing.assert_array_equal(res["lidar"]["yflip_points"][:, 2:],
                                      pts[:, 2:])

        bundle, _ = Reformat(double_flip=True)(res, {})
        assert {"yflip_points", "xflip_points",
                "double_flip_points"} <= set(bundle)
        bundle2, _ = Reformat()(res, {})
        assert "yflip_points" not in bundle2

    def test_flip_config_test_pipeline_composes(self):
        """The dcn_flip config's test_pipeline builds through the registry
        (the stage the config names must exist)."""
        import os

        import partner_tpu.data.pipeline  # registers stages
        from partner_tpu.data.registry import Compose
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), "..", "configs", "nusc", "voxelnet",
            "nusc_centerpoint_voxelnet_dcn_flip.py"))
        stages = [dict(s) for s in cfg.test_pipeline]
        # drop the IO stages that need dataset files on disk
        stages = [s for s in stages if not s["type"].startswith("Load")]
        pipe = Compose(stages)
        assert pipe is not None

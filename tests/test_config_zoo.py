"""Config zoo: every shipped config builds, inits, and runs one
loss + predict step (at a shrunk grid so CPU tests stay fast)."""

import copy
import os

import numpy as np
import pytest

from partner_tpu import testing
from partner_tpu.core import box_np_ops

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _shrink(cfg, factor=8):
    """Scale voxel_size up by `factor` (grid down) keeping ranges."""
    cfg = copy.deepcopy(cfg)
    vg = cfg["voxel_generator"] if isinstance(cfg, dict) else cfg.voxel_generator
    vs = list(vg["voxel_size"])
    vs[0] *= factor
    vs[1] *= factor
    vg["voxel_size"] = vs
    return cfg


def _scene(rng, pc_range, n=1500, cap=2048, with_vel=True):
    import jax.numpy as jnp

    boxes, cart = testing.synthetic_polar_scene(rng, pc_range, n, n_boxes=3)
    if with_vel:
        b9 = np.zeros((len(boxes), 9), np.float32)
        b9[:, :6] = boxes[:, :6]
        b9[:, -1] = boxes[:, -1]
        boxes = b9
    polar = box_np_ops.transform_points(cart[:, :3], "cylinder")
    polar = np.concatenate([polar, cart[:, 3:]], 1)
    pad = np.zeros((cap, polar.shape[1]), np.float32)
    m = np.zeros((cap,), bool)
    k = min(len(polar), cap)
    pad[:k] = polar[:k]
    m[:k] = True
    return boxes, jnp.asarray(pad[None]), jnp.asarray(m[None])


def _targets(cfg, boxes, nsectors=1):
    import jax.numpy as jnp

    from partner_tpu.data.pipeline import AssignLabel

    vg = cfg.voxel_generator
    grid = tuple(
        int(round((vg["range"][3 + i] - vg["range"][i]) / vg["voxel_size"][i]))
        for i in range(3))
    asg = dict(cfg.train_cfg["assigner"])
    asg["max_objs"] = 16
    al = AssignLabel(cfg=asg, rectify=cfg.get("rectify", False),
                     with_votemap=False, with_global_box=False)
    res = {"mode": "train", "lidar": {
        "voxels": dict(shape=np.asarray(grid),
                       range=np.asarray(vg["range"], np.float32),
                       size=np.asarray(vg["voxel_size"], np.float32)),
        "annotations": {"gt_boxes": boxes,
                        "gt_classes": np.ones(len(boxes), np.int64)}}}
    res, _ = al(res, {})
    return {k: [jnp.asarray(t)[None] for t in v] if isinstance(v, list)
            else jnp.asarray(v)[None]
            for k, v in res["lidar"]["targets"].items()}


def _voxelize_example(cfg, pts, mask):
    import jax
    import jax.numpy as jnp

    from partner_tpu.ops.voxelize import dynamic_voxelize

    vg = cfg.voxel_generator
    grid = tuple(
        int(round((vg["range"][3 + i] - vg["range"][i]) / vg["voxel_size"][i]))
        for i in range(3))
    vs = jnp.asarray(vg["voxel_size"], jnp.float32)
    pr = jnp.asarray(vg["range"], jnp.float32)
    vox = jax.vmap(lambda p, m: dynamic_voxelize(
        p, m, vs, pr, grid, max_voxels=8192))(pts, mask)
    return {"features": vox["features"], "coords": vox["coords"],
            "voxel_mask": vox["mask"]}


class TestConfigZoo:
    def _load(self, rel):
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 8
        vs[1] *= 8
        # the config wrapper may deep-copy; update every reference
        for vg in (cfg.voxel_generator,
                   cfg.bbox_head["voxel_generator"],
                   cfg.model["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        return cfg

    def test_cylinder_singlehead(self, rng):
        import jax

        from partner_tpu.models import build_detector

        cfg = self._load("nusc/voxelnet/voxelnet_det_cylinder_singlehead.py")
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        # nusc dynamic encoder: 7 feats [rho, phi, z, x, y, intensity, t]
        import jax.numpy as jnp
        feats7 = jnp.concatenate(
            [pts[..., :5], pts[..., 3:4] * 0, pts[..., 3:4] * 0], -1)
        ex = _voxelize_example(cfg, feats7, mask)
        ex.update(_targets(cfg, boxes))
        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))

    @pytest.mark.parametrize("rel,nsec", [
        ("nusc/pp/polarstream_det_1_sector.py", 1),
        ("nusc/pp/polarstream_det_4_sector_bidirectional.py", 4),
    ])
    def test_polarstream_configs(self, rng, rel, nsec):
        import jax

        from partner_tpu.models import build_detector

        cfg = self._load(rel)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.module.n_sectors == nsec
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        ex = {"points": pts, "points_mask": mask}
        ex.update(_targets(cfg, boxes, nsectors=nsec))
        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))

    def test_flagship_waymo_builds(self):
        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(
            os.path.join(CFG_DIR, "waymo/waymo_partner_36epoch.py"))
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det is not None


class TestMoreConfigs:
    @pytest.mark.parametrize("rel", [
        "nusc/pp/polarstream_det_n_seg_1_sector.py",
        "nusc/pp/polarstream_det_n_seg_4_sector_bidirectional.py",
        "nusc/pp/polarstream_det_n_seg_4_sector_trailing_edge.py",
        "waymo/waymo_centerpoint_voxelnet_36epoch.py",
    ])
    def test_builds_and_steps(self, rng, rel):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector

        loader = TestConfigZoo()
        cfg = loader._load(rel)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        if "waymo" in rel:
            feats7 = jnp.concatenate(
                [pts[..., :5], pts[..., 3:4] * 0, pts[..., 3:4] * 0], -1)
            ex = _voxelize_example(cfg, feats7, mask)
            boxes7 = np.concatenate([boxes[:, :6], boxes[:, -1:]], 1)
            ex.update(_targets(cfg, boxes7))
        else:
            ex = {"points": pts, "points_mask": mask}
            nsec = cfg.voxel_generator["nsectors"]
            ex.update(_targets(cfg, boxes, nsectors=nsec))
            if cfg.model.get("seg_head"):
                ex["points_label"] = jnp.asarray(rng.randint(
                    0, 17, np.asarray(mask).shape).astype(np.int32))
        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))


class TestScheduleVariants:
    """Schedule/two-sweep ports of the reference waymo voxelnet family
    (reference configs/waymo/voxelnet/waymo_centerpoint_voxelnet_{1x,
    3epoch,6epoch,two_sweeps_3x_with_velo}.py)."""

    @pytest.mark.parametrize("rel,epochs", [
        ("waymo/waymo_centerpoint_voxelnet_1x.py", 12),
        ("waymo/waymo_centerpoint_voxelnet_3epoch.py", 3),
        ("waymo/waymo_centerpoint_voxelnet_6epoch.py", 6),
    ])
    def test_schedule_variant_builds(self, rel, epochs):
        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        assert cfg.total_epochs == epochs
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det is not None

    def test_two_sweeps_with_velo_steps(self, rng):
        """8-feature two-sweep input + vel head branch: one loss +
        predict step."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector

        loader = TestConfigZoo()
        cfg = loader._load(
            "waymo/waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo.py")
        assert "vel" in dict(cfg.model["bbox_head"]["common_heads"])
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        # [rho, phi, z, x, y, intensity, elongation, time_lag]
        feats8 = jnp.concatenate(
            [pts[..., :5]] + [pts[..., 3:4] * 0] * 3, -1)
        ex = _voxelize_example(cfg, feats8, mask)
        ex.update(_targets(cfg, boxes))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))


class TestSegOnlyConfigs:
    """Segmentation-only VoxelNet ports (reference voxelnet_seg_10sweep /
    voxelnet_seg_cylinder, bbox_head=None per SURVEY §0)."""

    @pytest.mark.parametrize("rel,nfeat,layout", [
        ("nusc/voxelnet/voxelnet_seg_10sweep.py", 5, "cuboid"),
        ("nusc/voxelnet/voxelnet_seg_cylinder.py", 7, "cylinder"),
    ])
    def test_seg_only_builds_and_steps(self, rng, rel, nfeat, layout):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        assert cfg.model["bbox_head"] is None
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 8
        vs[1] *= 8
        for vg in (cfg.voxel_generator,
                   cfg.seg_head["voxel_generator"],
                   cfg.model["seg_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)

        pr = cfg.voxel_generator["range"]
        cap, n = 2048, 1200
        if layout == "cuboid":
            x = rng.uniform(pr[0] + 0.5, pr[3] - 0.5, n)
            y = rng.uniform(pr[1] + 0.5, pr[4] - 0.5, n)
            z = rng.uniform(pr[2] + 0.1, pr[5] - 0.1, n)
            cols = [x, y, z]
        else:
            rho = rng.uniform(pr[0] + 0.2, pr[3] - 0.2, n)
            phi = rng.uniform(pr[1], pr[4], n)
            z = rng.uniform(pr[2] + 0.1, pr[5] - 0.1, n)
            cols = [rho, phi, z, rho * np.cos(phi), rho * np.sin(phi)]
        while len(cols) < nfeat:
            cols.append(rng.rand(n))
        pts = np.stack(cols[:nfeat], 1).astype(np.float32)
        pad = np.zeros((cap, nfeat), np.float32)
        pad[:n] = pts
        m = np.zeros((cap,), bool)
        m[:n] = True
        pts_j = jnp.asarray(pad[None])
        mask_j = jnp.asarray(m[None])

        ex = _voxelize_example(cfg, pts_j, mask_j)
        ex["points"] = pts_j
        ex["points_mask"] = mask_j
        ex["points_label"] = jnp.asarray(
            rng.randint(0, 17, (1, cap)).astype(np.int32))

        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        assert "seg_loss" in ld
        out = det.predict(variables, ex)
        assert "box3d_lidar" not in out
        lab = np.asarray(out["point_seg_labels"])
        assert lab.shape == (1, cap)
        assert lab[0, :n].min() >= 0 and lab[0, :n].max() <= 16


class TestCartesianMultiTaskConfigs:
    """han_method / strobe ports: cuboid det+seg pillars
    (reference configs/nusc/pp/{han_method,strobe}/)."""

    def _cart_scene(self, rng, cfg, cap=2048, n=1200, nfeat=7):
        import jax.numpy as jnp

        pr = cfg.voxel_generator["range"]
        x = rng.uniform(pr[0] + 0.5, pr[3] - 0.5, n)
        y = rng.uniform(pr[1] + 0.5, pr[4] - 0.5, n)
        z = rng.uniform(pr[2] + 0.1, pr[5] - 0.1, n)
        cols = [x, y, z]
        while len(cols) < nfeat:
            cols.append(rng.rand(n))
        pts = np.stack(cols[:nfeat], 1).astype(np.float32)
        pad = np.zeros((cap, nfeat), np.float32)
        pad[:n] = pts
        m = np.zeros((cap,), bool)
        m[:n] = True
        boxes = np.zeros((3, 9), np.float32)
        boxes[:, 0] = [5.0, -10.0, 20.0]
        boxes[:, 1] = [5.0, 8.0, -15.0]
        boxes[:, 3:6] = [4.0, 2.0, 1.6]
        boxes[:, -1] = [0.3, -0.5, 1.0]
        return boxes, jnp.asarray(pad[None]), jnp.asarray(m[None])

    def _shrunk(self, rel):
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 8
        vs[1] *= 8
        for vg in (cfg.voxel_generator,
                   cfg.bbox_head["voxel_generator"],
                   cfg.model["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        return cfg

    def test_han_1_sector(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector

        cfg = self._shrunk("nusc/pp/han_1_sector.py")
        assert cfg.voxel_generator["voxel_shape"] == "cuboid"
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = self._cart_scene(rng, cfg)
        ex = {"points": pts, "points_mask": mask,
              "points_label": jnp.asarray(
                  rng.randint(0, 17, (1, pts.shape[1])).astype(np.int32))}
        ex.update(_targets(cfg, boxes))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"])) and "seg_loss" in ld
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))
        assert out["point_seg_labels"].shape == mask.shape

    def test_han_4_sectors(self, rng):
        """Cartesian 4-sector streaming LSTM pillars (reference
        han_4_sectors.py: PointPillarsLSTMV1 + RPNWaymo + reduced grid)."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.models.polarstream import cart_sector_spec

        cfg = self._shrunk("nusc/pp/han_4_sectors.py")
        assert cfg.model["type"] == "PointPillarsLSTMV1"
        assert cfg.model["neck"]["type"] == "RPNWaymo"
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.module.voxel_shape == "cuboid"
        assert det.module.n_sectors == 4

        # reduced-grid spec: both dims halved, range clipped at 0
        pr = cfg.voxel_generator["range"]
        grid = tuple(int(round(
            (pr[3 + i] - pr[i]) / cfg.voxel_generator["voxel_size"][i]))
            for i in range(3))
        sr, sg = cart_sector_spec(pr, grid, 4)
        assert sr[3] == 0.0 and sr[4] == 0.0
        assert sg[0] == grid[0] // 2 and sg[1] == grid[1] // 2

        # sector rotation: every selected point lands in the canonical
        # wedge [-pi, -pi/2) and inside the reduced cart bbox
        boxes, pts, mask = self._cart_scene(rng, cfg)
        for s in range(4):
            pts_s, sel = det.module._rotate_to_sector(pts, mask, s)
            x, y = np.asarray(pts_s[..., 0]), np.asarray(pts_s[..., 1])
            selm = np.asarray(sel[0])
            if selm.any():
                phi = np.arctan2(y[0][selm], x[0][selm])
                assert phi.max() < -np.pi / 2 + 1e-5
                assert (x[0][selm] <= 1e-4).all()
                assert (y[0][selm] <= 1e-4).all()

        ex = {"points": pts, "points_mask": mask,
              "points_label": jnp.asarray(
                  rng.randint(0, 17, (1, pts.shape[1])).astype(np.int32))}
        ex.update(_targets(cfg, boxes, nsectors=4))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"])) and "seg_loss" in ld
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))

    def test_strobe_4_sector(self, rng):
        """Cartesian 4-sector STROBE: sweeps x sectors with per-sector
        previous-sweep context (reference strobe_4_sector.py)."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector

        cfg = self._shrunk("nusc/pp/strobe_4_sector.py")
        assert cfg.model["type"] == "STROBE"
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.module.n_sectors == 4
        boxes, pts, mask = self._cart_scene(rng, cfg)
        pts2 = jnp.stack([pts, pts], axis=1)
        mask2 = jnp.stack([mask, mask], axis=1)
        ex = {"points": pts2, "points_mask": mask2,
              "points_label": jnp.asarray(
                  rng.randint(0, 17, (1, pts.shape[1])).astype(np.int32))}
        ex.update(_targets(cfg, boxes, nsectors=4))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"])) and "seg_loss" in ld
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))
        assert out["point_seg_labels"].shape == (1, pts.shape[1])

    def test_strobe_1_sector(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector

        cfg = self._shrunk("nusc/pp/strobe_1_sector.py")
        assert cfg.model["type"] == "STROBE"
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = self._cart_scene(rng, cfg)
        # two sweeps: previous + current (the RPNUber carry)
        pts2 = jnp.stack([pts, pts], axis=1)      # (B, S=2, P, C)
        mask2 = jnp.stack([mask, mask], axis=1)   # (B, S=2, P)
        ex = {"points": pts2, "points_mask": mask2,
              "points_label": jnp.asarray(
                  rng.randint(0, 17, (1, pts.shape[1])).astype(np.int32))}
        ex.update(_targets(cfg, boxes))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"])) and "seg_loss" in ld
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))
        assert out["point_seg_labels"].shape == (1, pts.shape[1])


class TestWaymoPPConfigs:
    """Waymo cartesian CenterPoint-Pillar ports (reference
    configs/waymo/pp/)."""

    @pytest.mark.parametrize("rel,ncls", [
        ("waymo/pp/waymo_centerpoint_pp_two_pfn_stride1_3x.py", 3),
        ("waymo/pp/waymo_centerpoint_pp_two_cls_two_pfn_stride1_3x.py", 2),
    ])
    def test_pp_builds_and_steps(self, rng, rel, ncls):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        assert len(cfg.tasks[0]["class_names"]) == ncls
        vs = list(cfg.voxel_generator["voxel_size"])
        # factor 9 keeps the shrunk grid (52) divisible by the RPN's
        # stride product of 4 (full scale: 468 = 4 * 117)
        vs[0] *= 9
        vs[1] *= 9
        for vg in (cfg.voxel_generator, cfg.bbox_head["voxel_generator"],
                   cfg.model["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        cfg.model["reader"]["voxel_size"] = tuple(vs)

        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        helper = TestCartesianMultiTaskConfigs()
        boxes, pts, mask = helper._cart_scene(rng, cfg, nfeat=5)
        boxes7 = np.concatenate([boxes[:, :6], boxes[:, -1:]], 1)
        ex = {"points": pts, "points_mask": mask}
        ex.update(_targets(cfg, boxes7))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))


class TestTwoStageConfigs:
    """Two-stage RoI fine-tune ports (reference
    configs/waymo/voxelnet/two_stage/)."""

    @pytest.mark.parametrize("rel", [
        "waymo/pp/two_stage/"
        "waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_6epoch.py",
        "waymo/pp/two_stage/"
        "waymo_centerpoint_pp_two_cls_two_pfn_stride1_two_stage_bev_6epoch"
        ".py",
    ])
    def test_pp_two_stage_builds_and_steps(self, rng, rel):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 9
        vs[1] *= 9
        fs = cfg.model["first_stage_cfg"]
        for vg in (cfg.voxel_generator, cfg.bbox_head["voxel_generator"],
                   fs["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        fs["reader"]["voxel_size"] = tuple(vs)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)

        helper = TestCartesianMultiTaskConfigs()
        boxes, pts, mask = helper._cart_scene(rng, cfg, nfeat=5)
        boxes7 = np.concatenate([boxes[:, :6], boxes[:, -1:]], 1)
        ex = {"points": pts, "points_mask": mask}
        ex.update(_targets(cfg, boxes7))
        m = len(boxes7)
        gb = np.zeros((1, 16, 8), np.float32)
        gb[0, :m, :7] = boxes7
        gb[0, :m, 7] = 1.0
        gm = np.zeros((1, 16), bool)
        gm[0, :m] = True
        ex["global_box"] = jnp.asarray(gb)
        ex["global_box_mask"] = jnp.asarray(gm)

        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        assert "roi_cls_loss" in ld
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))

    @pytest.mark.parametrize("rel,nsweeps", [
        ("waymo/two_stage/"
         "waymo_centerpoint_voxelnet_two_stage_bev_5point_ft_6epoch_freeze"
         ".py", 1),
        ("waymo/two_stage/"
         "waymo_centerpoint_voxelnet_two_sweep_two_stage_bev_5point_ft_"
         "6epoch_freeze_with_vel.py", 2),
    ])
    def test_two_stage_builds_and_steps(self, rng, rel, nsweeps):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(CFG_DIR, rel))
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 8
        vs[1] *= 8
        fs = cfg.model["first_stage_cfg"]
        for vg in (cfg.voxel_generator, cfg.bbox_head["voxel_generator"],
                   fs["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        assert cfg.model["freeze"] is True
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)

        nfeat = fs["reader"]["num_input_features"]
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        featsN = jnp.concatenate(
            [pts[..., :5]] + [pts[..., 3:4] * 0] * (nfeat - 5), -1)
        ex = _voxelize_example(cfg, featsN, mask)
        boxes7 = np.concatenate([boxes[:, :6], boxes[:, -1:]], 1)
        ex.update(_targets(cfg, boxes7))
        m = len(boxes7)
        gb = np.zeros((1, 16, 8), np.float32)
        gb[0, :m, :7] = boxes7
        gb[0, :m, 7] = 1.0  # class (1-based)
        gm = np.zeros((1, 16), bool)
        gm[0, :m] = True
        ex["global_box"] = jnp.asarray(gb)
        ex["global_box_mask"] = jnp.asarray(gm)

        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        assert "roi_cls_loss" in ld and "roi_reg_loss" in ld
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))


class TestDCNConfig:
    def test_01voxel_builds_and_steps(self, rng):
        """Plain-SepHead sibling of the DCN config (reference
        nusc_centerpoint_voxelnet_01voxel.py)."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(
            CFG_DIR, "nusc/voxelnet/nusc_centerpoint_voxelnet_01voxel.py"))
        assert cfg.bbox_head["dcn_head"] is False
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 8
        vs[1] *= 8
        for vg in (cfg.voxel_generator, cfg.bbox_head["voxel_generator"],
                   cfg.model["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        feats7 = jnp.concatenate(
            [pts[..., :5], pts[..., 3:4] * 0, pts[..., 3:4] * 0], -1)
        ex = _voxelize_example(cfg, feats7, mask)
        ex.update(_targets(cfg, boxes))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        assert "feature_adapt_cls" not in str(
            jax.tree_util.tree_structure(variables["params"]["bbox_head"]))
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))

    def test_dcn_flip_tta_predict(self, rng):
        """double_flip=True: a truly flip-grouped B*4 cartesian batch
        decodes to B results whose peak is NOT crushed by misalignment
        (the de-flip geometry check; reference dcn_flip TTA contract)."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(
            CFG_DIR, "nusc/voxelnet/nusc_centerpoint_voxelnet_dcn_flip.py"))
        assert cfg.test_cfg["double_flip"] is True
        assert cfg.voxel_generator["voxel_shape"] == "cuboid"
        vs = list(cfg.voxel_generator["voxel_size"])
        # factor 10 keeps the shrunk grid (144) stride-8 divisible
        vs[0] *= 10
        vs[1] *= 10
        for vg in (cfg.voxel_generator, cfg.bbox_head["voxel_generator"],
                   cfg.model["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        det_plain = build_detector(
            cfg.model, cfg.train_cfg,
            {**dict(cfg.test_cfg), "double_flip": False})

        pr = cfg.voxel_generator["range"]
        cap, n = 1024, 700
        x = rng.uniform(pr[0] + 1, pr[3] - 1, n)
        y = rng.uniform(pr[1] + 1, pr[4] - 1, n)
        z = rng.uniform(pr[2] + 0.2, pr[5] - 0.2, n)
        pts = np.stack([x, y, z, rng.rand(n), rng.rand(n)], 1)
        pad = np.zeros((cap, 5), np.float32)
        pad[:n] = pts
        m = np.zeros((cap,), bool)
        m[:n] = True
        yflip = pad.copy()
        yflip[:, 1] *= -1
        xflip = pad.copy()
        xflip[:, 0] *= -1
        xyflip = pad.copy()
        xyflip[:, :2] *= -1
        batch4 = jnp.asarray(np.stack([pad, yflip, xflip, xyflip]))
        mask4 = jnp.asarray(np.stack([m] * 4))
        ex4 = _voxelize_example(cfg, batch4, mask4)
        ex1 = _voxelize_example(cfg, jnp.asarray(pad[None]),
                                jnp.asarray(m[None]))

        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex1)
        out = det.predict(variables, ex4)
        assert out["box3d_lidar"].shape[0] == 1  # B*4 -> B
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))
        top_tta = float(np.asarray(out["scores"]).max())
        out_plain = det_plain.predict(variables, ex1)
        top_plain = float(np.asarray(out_plain["scores"]).max())
        # a de-flip geometry bug misaligns the four maps and crushes the
        # averaged peak toward the background level; correct de-flipping
        # keeps it within a factor of the single-view peak
        assert top_tta > 0.5 * top_plain, (top_tta, top_plain)

    def test_nusc_dcn_builds_and_steps(self, rng):
        """nusc CenterPoint-DCN config: 6 task groups through DCNSepHead
        (reference nusc_centerpoint_voxelnet_0075voxel_dcn.py analog)."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import build_detector
        from partner_tpu.train.config import Config

        cfg = Config.fromfile(os.path.join(
            CFG_DIR, "nusc/voxelnet/nusc_centerpoint_voxelnet_dcn.py"))
        vs = list(cfg.voxel_generator["voxel_size"])
        vs[0] *= 8
        vs[1] *= 8
        for vg in (cfg.voxel_generator,
                   cfg.bbox_head["voxel_generator"],
                   cfg.model["bbox_head"]["voxel_generator"]):
            vg["voxel_size"] = list(vs)

        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        boxes, pts, mask = _scene(rng, cfg.voxel_generator["range"])
        feats7 = jnp.concatenate(
            [pts[..., :5], pts[..., 3:4] * 0, pts[..., 3:4] * 0], -1)
        ex = _voxelize_example(cfg, feats7, mask)
        ex.update(_targets(cfg, boxes))
        variables = jax.jit(det.init)(jax.random.PRNGKey(0), ex)
        # DCN offset convs are zero-initialized (FeatureAdaption.init_offset)
        p = variables["params"]["bbox_head"]["task0"]
        np.testing.assert_allclose(np.asarray(
            p["feature_adapt_cls"]["conv_offset"]["kernel"]), 0.0)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        out = det.predict(variables, ex)
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))

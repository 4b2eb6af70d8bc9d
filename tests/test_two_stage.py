"""Two-stage RoI refinement: targets, sampling, loss, predict."""

import numpy as np
import pytest

from partner_tpu import testing

TINY_PR = testing.TINY_PR
GRID = (64, 128, 24)


def _first_cfg():
    vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
          (TINY_PR[4] - TINY_PR[1]) / GRID[1],
          (TINY_PR[5] - TINY_PR[2]) / GRID[2]]
    vg = dict(range=TINY_PR, voxel_size=vs, nsectors=1)
    return dict(
        type="VoxelNet",
        reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=5),
        neck=dict(type="RPN", layer_nums=[2, 2], ds_layer_strides=[1, 2],
                  ds_num_filters=[32, 64], us_layer_strides=[1, 2],
                  us_num_filters=[32, 32], num_input_features=32),
        bbox_head=dict(
            type="CenterHead", in_channels=64,
            tasks=[dict(num_class=1, class_names=["Vehicle"])],
            common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                          "rot": (2, 2)},
            dataset="waymo", weight=0.25, code_weights=[1.0] * 8,
            voxel_generator=vg, out_size_factor=8,
        ),
    )


def _example(rng, b=1, n=512, max_objs=8):
    import jax.numpy as jnp

    ex = testing.make_example(rng, b=b, n_points=1500, cap=2048,
                              max_objs=max_objs)
    # add center-head targets
    from partner_tpu.core.targets import CenterTargetAssigner

    vs = [(TINY_PR[3] - TINY_PR[0]) / GRID[0],
          (TINY_PR[4] - TINY_PR[1]) / GRID[1],
          (TINY_PR[5] - TINY_PR[2]) / GRID[2]]
    ta = CenterTargetAssigner(
        tasks=[dict(num_class=1, class_names=["Vehicle"])],
        out_size_factor=8, max_objs=max_objs, voxel_shape="cylinder")
    hm, ab, ind, m, cat = [], [], [], [], []
    gb = np.asarray(ex["global_box"])
    for i in range(b):
        boxes = gb[i][gb[i][:, -1] > 0][:, :7]
        t = ta.assign(boxes, np.ones(len(boxes), np.int64), GRID, vs,
                      TINY_PR)
        hm.append(t["hm"][0]); ab.append(t["anno_box"][0])
        ind.append(t["ind"][0]); m.append(t["mask"][0]); cat.append(t["cat"][0])
    for k, v in (("hm", hm), ("anno_box", ab), ("ind", ind), ("mask", m),
                 ("cat", cat)):
        ex[k] = [jnp.asarray(np.stack(v))]
    return ex


class TestResidualCoder:
    def test_roundtrip(self, rng):
        import jax.numpy as jnp

        from partner_tpu.models.two_stage import (apply_residuals,
                                                  proposal_targets)

        props = np.zeros((6, 7), np.float32)
        props[:, :2] = rng.uniform(-20, 20, (6, 2))
        props[:, 2] = rng.uniform(-1, 1, 6)
        props[:, 3:6] = rng.uniform(1, 5, (6, 3))
        props[:, 6] = rng.uniform(-np.pi, np.pi, 6)
        gt = props.copy()
        gt[:, :2] += rng.uniform(-0.5, 0.5, (6, 2))
        gt[:, 6] += rng.uniform(-0.2, 0.2, 6)
        gt8 = np.concatenate([gt, np.ones((6, 1), np.float32)], 1)

        iou_t, reg_t, pos = proposal_targets(
            jnp.asarray(props), jnp.asarray(gt8), jnp.ones(6, bool))
        rec = apply_residuals(jnp.asarray(props), reg_t)
        np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-4)
        # most jittered proposals stay above the 0.55 positive threshold
        assert int(pos.sum()) >= 4


class TestBEVSampling:
    def test_bilinear_at_cell_centers(self, rng):
        import jax.numpy as jnp

        from partner_tpu.models.two_stage import bev_bilinear_sample

        n_az, n_r, c = 16, 12, 3
        bev = jnp.asarray(rng.rand(n_az, n_r, c).astype(np.float32))
        # pick exact cell centers -> samples equal the map values
        ai, bi = 5, 7  # r idx, az idx
        rho = TINY_PR[0] + (ai + 0.5) * (TINY_PR[3] - TINY_PR[0]) / n_r
        phi = TINY_PR[1] + (bi + 0.5) * (TINY_PR[4] - TINY_PR[1]) / n_az
        pt = jnp.asarray([[rho * np.cos(phi), rho * np.sin(phi)]])
        got = bev_bilinear_sample(bev, pt, TINY_PR, 8, GRID)
        np.testing.assert_allclose(np.asarray(got)[0],
                                   np.asarray(bev)[bi, ai], rtol=1e-4)


class TestTwoStageEndToEnd:
    def test_loss_and_predict(self, rng):
        import jax

        from partner_tpu.models import build_detector

        tc = dict(score_threshold=0.05,
                  post_center_limit_range=[-40, -40, -5, 40, 40, 5],
                  nms=dict(nms_pre_max_size=128, nms_post_max_size=16,
                           nms_iou_threshold=0.7))
        det = build_detector(
            dict(type="TwoStageDetector", first_stage_cfg=_first_cfg(),
                 roi_head=dict(fc=(64, 64)), num_point=5),
            test_cfg=tc)
        ex = _example(rng)
        variables = det.init(jax.random.PRNGKey(0), ex)
        ld, _ = det.loss(variables, ex, jax.random.PRNGKey(1))
        assert np.isfinite(float(ld["loss"]))
        assert "roi_cls_loss" in ld and "roi_reg_loss" in ld

        out = det.predict(variables, ex)
        assert out["box3d_lidar"].shape[-1] == 7
        assert np.all(np.isfinite(np.asarray(out["box3d_lidar"])))
        assert np.all(np.asarray(out["scores"]) >= 0)

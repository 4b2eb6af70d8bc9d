import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partner_tpu import testing
from partner_tpu.core.targets import CenterTargetAssigner
from partner_tpu.models import build_detector

PR = testing.TINY_PR
GRID = testing.TINY_GRID
VS = testing.TINY_VS

TASKS = [dict(num_class=2, class_names=["car", "pedestrian"])]


def nusc_style_cfg():
    return dict(
        type="VoxelNet",
        reader=dict(type="DynamicVoxelEncoderV1", num_input_features=5),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=5),
        neck=dict(
            type="RPN", layer_nums=[2, 2], ds_layer_strides=[1, 2],
            ds_num_filters=[32, 64], us_layer_strides=[1, 2],
            us_num_filters=[32, 32], num_input_features=32,
        ),
        bbox_head=dict(
            type="CenterHeadSinglePos",
            in_channels=64,
            tasks=TASKS,
            dataset="nuscenes",
            weight=0.5,
            code_weights=[1.5, 1.5, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 1.0, 1.0],
            common_heads={"reg": (2, 2), "rot_vel": (2, 2), "height": (1, 2),
                          "dim": (3, 2)},
            share_conv_channel=64,
            voxel_shape="cylinder",
            voxel_generator=dict(range=PR, voxel_size=VS, nsectors=1),
            out_size_factor=8,
        ),
    )


def make_center_example(rng, b=2):
    ex = testing.make_example(rng, b=b, n_points=2500, cap=4096)
    assigner = CenterTargetAssigner(
        tasks=TASKS, out_size_factor=8, voxel_shape="cylinder"
    )
    per_key = {"hm": [], "anno_box": [], "ind": [], "mask": [], "cat": []}
    gt = np.asarray(ex["global_box"])
    for i in range(b):
        valid = gt[i, :, 7] > 0
        boxes = np.zeros((valid.sum(), 10), np.float32)
        boxes[:, :7] = gt[i, valid, :7]
        boxes[:, -1] = gt[i, valid, 6]  # yaw last for 10-col layout
        classes = rng.randint(1, 3, len(boxes))
        t = assigner.assign(boxes, classes, GRID, VS, PR)
        for k in per_key:
            per_key[k].append(t[k])
    # stack: list over batch of lists over tasks -> per-task batched arrays
    n_tasks = 1
    for k in per_key:
        per_key[k] = [
            jnp.asarray(np.stack([per_key[k][i][t] for i in range(b)]))
            for t in range(n_tasks)
        ]
    # NHWC heatmaps
    per_key["hm"] = [h.transpose(0, 2, 3, 1) for h in per_key["hm"]]
    ex.update(per_key)
    return ex


@pytest.fixture(scope="module")
def det_vars_ex():
    rng = np.random.RandomState(11)
    det = build_detector(nusc_style_cfg(), test_cfg=dict(
        score_threshold=0.1, per_class_nms=True,
        post_center_limit_range=[-40, -40, -5, 40, 40, 5],
        nms=dict(nms_pre_max_size=256, nms_post_max_size=16,
                 nms_iou_threshold=0.2),
        rectify=True,
    ))
    ex = make_center_example(rng)
    variables = det.init(jax.random.PRNGKey(0), ex)
    return det, variables, ex


class TestCenterHeadSinglePos:
    def test_forward_keys(self, det_vars_ex):
        det, variables, ex = det_vars_ex
        preds = det.apply(variables, ex, train=False)
        p = preds["det_preds"][0]
        assert p["hm"].shape[-1] == 2
        assert p["reg"].shape[-1] == 2
        assert p["rot"].shape[-1] == 2 and p["vel"].shape[-1] == 2

    def test_loss_finite(self, det_vars_ex):
        det, variables, ex = det_vars_ex
        ld, _ = det.loss(variables, ex)
        assert np.isfinite(float(ld["loss"]))
        assert np.isfinite(float(ld["hm_loss"][0]))
        assert np.isfinite(float(ld["loc_loss"][0]))

    def test_predict(self, det_vars_ex):
        det, variables, ex = det_vars_ex
        out = det.predict(variables, ex)
        assert out["box3d_lidar"].shape == (2, 16, 9)
        assert out["label_preds"].max() < 2


class TestRSNormRaggedTail:
    def test_tail_normalized_with_last_stratum_stats(self, rng):
        import jax
        import jax.numpy as jnp
        from partner_tpu.models.center_head import RSNorm

        x = jnp.asarray(rng.randn(2, 6, 10, 8).astype(np.float32)) * 3 + 1
        norm = RSNorm(num_heads=1, num_groups=4)
        v = norm.init(jax.random.PRNGKey(0), x)
        y = np.asarray(norm.apply(v, x))
        assert y.shape == x.shape
        # tail columns (8:10) must NOT be raw input
        assert not np.allclose(y[..., 8:, :], np.asarray(x)[..., 8:, :])
        # tail uses last stratum stats: recompute by hand
        xs = np.asarray(x)
        last = xs[:, :, 6:8, :]  # stratum 3 (step=2)
        mean = last.mean(axis=(1, 2, 3), keepdims=True)
        var = last.var(axis=(1, 2, 3), keepdims=True)
        want = (xs[:, :, 8:, :] - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(y[..., 8:, :], want, rtol=1e-4, atol=1e-5)


class TestDoubleFlip:
    def test_deflip_average_recovers_original(self, rng):
        """Maps built by actually flipping a base map must average back to
        the base predictions (cartesian BEV)."""
        import jax.numpy as jnp
        from partner_tpu.models.center_head import double_flip_average

        h, w = 8, 10
        base = {
            "hm": rng.randn(1, h, w, 1).astype(np.float32),
            "reg": rng.rand(1, h, w, 2).astype(np.float32),
            "height": rng.randn(1, h, w, 1).astype(np.float32),
            "dim": rng.randn(1, h, w, 3).astype(np.float32),
            "rot": rng.randn(1, h, w, 2).astype(np.float32),
            "vel": rng.randn(1, h, w, 2).astype(np.float32),
        }
        flipped = {}
        for k, v in base.items():
            vy = v[:, ::-1].copy()
            vx = v[:, :, ::-1].copy()
            vxy = v[:, ::-1, ::-1].copy()
            if k == "reg":
                vy[..., 1] = 1 - vy[..., 1]
                vx[..., 0] = 1 - vx[..., 0]
                vxy[..., 0] = 1 - vxy[..., 0]
                vxy[..., 1] = 1 - vxy[..., 1]
            if k == "rot":  # (sin, cos)
                vy[..., 1] *= -1
                vx[..., 0] *= -1
                vxy[..., 0] *= -1
                vxy[..., 1] *= -1
            if k == "vel":
                vy[..., 1] *= -1
                vx[..., 0] *= -1
                vxy *= -1
            flipped[k] = jnp.asarray(np.concatenate([v, vy, vx, vxy]))

        out = double_flip_average(flipped)
        np.testing.assert_allclose(
            np.asarray(out["hm"]),
            1 / (1 + np.exp(-base["hm"])), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["reg"]), base["reg"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["rot"]), base["rot"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["vel"]), base["vel"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["dim"]),
                                   np.exp(base["dim"]), rtol=1e-4)

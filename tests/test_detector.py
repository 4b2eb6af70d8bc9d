import numpy as np
import jax
import jax.numpy as jnp
import pytest

from partner_tpu.core import box_np_ops, targets
from partner_tpu.models import DETECTORS, build_detector
from partner_tpu.ops import voxelize
from partner_tpu.train.config import Config

# tiny flagship-shaped config: grid (64, 128, 16), stride 8 -> map (16, 8)
PR = [0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8]
VS = [(PR[3] - PR[0]) / 64, (PR[4] - PR[1]) / 128, (PR[5] - PR[2]) / 24]
GRID = (64, 128, 24)


def tiny_model_cfg():
    return dict(
        type="VoxelNetV3",
        reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=5),
        neck=dict(
            type="RPN", layer_nums=[2, 2], ds_layer_strides=[1, 2],
            ds_num_filters=[32, 64], us_layer_strides=[1, 2],
            us_num_filters=[32, 32], num_input_features=32,
            set_depth=2, set_h=2, set_w=8,
        ),
        bbox_head=dict(
            type="E2ESWVoteHead",
            in_channels=64,
            voxel_generator=dict(range=PR, voxel_size=VS),
            out_size_factor=8,
            voxel_shape="cylinder",
            SET_CRIT_CONFIG={
                "weight_dict": {"loss_ce": 1, "loss_bbox": 2,
                                "loss_vote": 0.25, "loss_vote_cls": 1,
                                "loss_iou": 2},
                "losses": ["loss_ce", "loss_bbox", "loss_vote",
                           "loss_vote_cls", "loss_iou"],
                "sigma": 3.0, "code_weights": [1.0] * 8,
            },
            CODER_CONFIG={"code_size": 7, "encode_angle_by_sincos": True},
            MATCHER_CONFIG={"weight_dict": {"loss_ce": 0.25,
                                            "loss_bbox": 0.75}},
            HEAD_CONFIG={"kernel_size": 3, "window_size": 4, "sl_depth": [2],
                         "iou_loss": True, "iou_factor": 1,
                         "init_bias": -2.19, "num_classes": 1},
        ),
    )


def make_example(rng, b=2, n_points=3000, cap=4096):
    """Synthetic polar batch with 2 gt vehicles per scene."""
    gt = np.zeros((b, 8, 8), np.float32)
    examples = {"features": [], "coords": [], "voxel_mask": []}
    votemaps = []
    for i in range(b):
        boxes = np.array(
            [[12.0 + i, 3.0, 0.2, 4.5, 2.0, 1.6, 0.3],
             [22.0, -6.0 + i, -0.1, 4.2, 1.9, 1.5, -1.0]], np.float32
        )
        gt[i, :2, :7] = boxes
        gt[i, :2, 7] = 1  # class Vehicle (1-based)

        pts_on_boxes = []
        for bx in boxes:
            k = n_points // 4
            local = np.random.RandomState(i).uniform(-0.5, 0.5, (k, 3)) * bx[3:6]
            pts_on_boxes.append(local + bx[:3])
        bg_r = rng.uniform(1, 35, n_points // 2)
        bg_t = rng.uniform(-np.pi, np.pi, n_points // 2)
        bg = np.stack([bg_r * np.cos(bg_t), bg_r * np.sin(bg_t),
                       rng.uniform(-1.5, 2.5, n_points // 2)], 1)
        pts = np.concatenate(pts_on_boxes + [bg]).astype(np.float32)
        pts = np.concatenate([pts, rng.rand(len(pts), 1).astype(np.float32)], 1)
        polar = box_np_ops.transform_points(pts, "cylinder")[:, :5]

        pad = np.zeros((cap, 5), np.float32)
        m = np.zeros((cap,), bool)
        pad[: len(polar)] = polar
        m[: len(polar)] = True
        vox = voxelize.dynamic_voxelize(
            jnp.asarray(pad), jnp.asarray(m), jnp.asarray(VS, dtype=jnp.float32),
            jnp.asarray(PR, dtype=jnp.float32), GRID, max_voxels=cap,
        )
        examples["features"].append(vox["features"])
        examples["coords"].append(vox["coords"])
        examples["voxel_mask"].append(vox["mask"])
        votemaps.append(
            targets.draw_votemap(boxes, np.zeros(2), 1, GRID, VS, PR, 8)
        )

    ex = {k: jnp.stack(v) for k, v in examples.items()}
    ex["global_box"] = jnp.asarray(gt)
    ex["global_box_mask"] = jnp.asarray(gt[..., 7] > 0)
    ex["votemap_flat"] = jnp.asarray(
        np.stack(votemaps).reshape(b, -1, 5)
    )
    return ex


@pytest.fixture(scope="module")
def det_and_vars():
    rng = np.random.RandomState(3)
    det = build_detector(tiny_model_cfg(), test_cfg=dict(
        score_threshold=0.1,
        post_center_limit_range=[-40, -40, -5, 40, 40, 5],
        nms=dict(nms_pre_max_size=128, nms_post_max_size=16,
                 nms_iou_threshold=0.7),
    ))
    ex = make_example(rng)
    variables = det.init(jax.random.PRNGKey(0), ex)
    return det, variables, ex


class TestVoxelNetV3:
    def test_registry_build(self):
        assert DETECTORS.get("VoxelNetV3") is not None

    def test_loss_finite(self, det_and_vars):
        det, variables, ex = det_and_vars
        ld, updates = det.loss(variables, ex, rng=jax.random.PRNGKey(1))
        for k in ["loss", "loss_ce", "loss_bbox", "loss_vote",
                  "loss_vote_cls", "loss_iou"]:
            assert np.isfinite(float(ld[k])), k
        assert "batch_stats" in updates

    def test_predict_shapes(self, det_and_vars):
        det, variables, ex = det_and_vars
        out = det.predict(variables, ex)
        assert out["box3d_lidar"].shape == (2, 16, 7)
        assert out["scores"].shape == (2, 16)
        assert out["label_preds"].shape == (2, 16)
        assert out["mask"].shape == (2, 16)

    def test_grad_step_reduces_loss(self, det_and_vars):
        det, variables, ex = det_and_vars
        import optax

        opt = optax.adam(3e-4)

        @jax.jit
        def step(v, opt_state, rng):
            def lf(params):
                merged = {**v, "params": params}
                ld, _ = det.loss(merged, ex, rng=rng)
                return ld["loss"]

            l, g = jax.value_and_grad(lf)(v["params"])
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(v["params"], updates)
            return {**v, "params": params}, opt_state, l

        v = variables
        s = opt.init(v["params"])
        losses = []
        for i in range(6):
            v, s, l = step(v, s, jax.random.PRNGKey(i))
            losses.append(float(l))
        assert losses[-1] < losses[0]


class TestPrepareInference:
    """E2EDetector.prepare_inference precomputes the static RPE tables;
    a cache-warmed predict must reproduce the live predict exactly
    (swin_vote.WindowAttention static-RPE cache)."""

    def test_warmed_predict_matches_live(self, det_and_vars):
        det, variables, ex = det_and_vars
        live = det.predict(variables, ex)
        warmed_vars = det.prepare_inference(variables, ex)
        assert "rpe_cache" in warmed_vars
        got = det.predict(warmed_vars, ex)
        for k in live:
            np.testing.assert_allclose(
                np.asarray(got[k]).astype(np.float32),
                np.asarray(live[k]).astype(np.float32),
                atol=1e-5, err_msg=k)

    def test_warmed_predict_jits(self, det_and_vars):
        det, variables, ex = det_and_vars
        warmed_vars = det.prepare_inference(variables, ex)
        out = jax.jit(det.predict)(warmed_vars, ex)
        assert np.isfinite(np.asarray(out["scores"])).all()

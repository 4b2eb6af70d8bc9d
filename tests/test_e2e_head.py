import numpy as np
import jax
import jax.numpy as jnp

from partner_tpu.core import targets
from partner_tpu.core.center_coder import CenterCoder
from partner_tpu.losses.set_crit import SetCriterion
from partner_tpu.models.e2e_head import E2ESWVoteHead

# small polar grid: (n_r, n_az, n_z) = (64, 128, 16), stride 8 -> (8, 16)
GRID = (64, 128, 16)
PR = (0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8)


def make_head():
    return E2ESWVoteHead(
        in_channels=32, num_classes=1, grid_size=GRID, pc_range=PR,
        out_size_factor=8, window_size=4, sl_depth=2, num_heads=2,
    )


def init_head(rng):
    head = make_head()
    x = jnp.asarray(rng.randn(2, 16, 8, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    return head, variables, x


class TestE2EHeadForward:
    def test_output_keys_shapes(self, rng):
        head, variables, x = init_head(rng)
        out = head.apply(variables, x, train=False)
        assert out["hm"].shape == (2, 16, 8, 1)
        assert out["reg"].shape == (2, 16, 8, 2)
        assert out["height"].shape == (2, 16, 8, 1)
        assert out["dim"].shape == (2, 16, 8, 3)
        assert out["rot"].shape == (2, 16, 8, 2)
        assert out["iou"].shape == (2, 16, 8, 1)
        assert out["pred_centers"].shape == (2, 16, 8, 2)

    def test_init_bias_on_hm(self, rng):
        head, variables, x = init_head(rng)
        out = head.apply(variables, jnp.zeros_like(x), train=False)
        # with zero input, hm logits ~ init_bias -2.19 -> sigmoid ~0.1
        hm = np.asarray(jax.nn.sigmoid(out["hm"]))
        assert 0.05 < hm.mean() < 0.2

    def test_decode_geometry(self, rng):
        head, variables, x = init_head(rng)
        out = head.apply(variables, x, train=False)
        boxes, scores = head.apply(
            variables, out, method=E2ESWVoteHead.decode
        )
        assert boxes.shape == (2, 128, 7)
        assert scores.shape == (2, 128, 1)
        # decoded xy must lie near the polar grid footprint
        rho = np.hypot(np.asarray(boxes[..., 0]), np.asarray(boxes[..., 1]))
        assert rho.max() < 50.0


class TestE2ELoss:
    def test_loss_decreases_on_overfit(self, rng):
        head, variables, x = init_head(rng)
        coder = CenterCoder(code_size=7, encode_angle_by_sincos=True)
        crit = SetCriterion(
            box_coder=coder,
            weight_dict={"loss_ce": 1, "loss_bbox": 2, "loss_vote": 0.25,
                         "loss_vote_cls": 1, "loss_iou": 2},
            losses=["loss_ce", "loss_bbox", "loss_vote", "loss_vote_cls",
                    "loss_iou"],
        )
        gt_boxes = np.zeros((2, 4, 7), np.float32)
        gt_boxes[:, 0] = [10.0, 2.0, 0.2, 4.5, 2.0, 1.6, 0.3]
        gt_boxes[:, 1] = [20.0, -6.0, -0.1, 4.0, 1.9, 1.5, -1.2]
        gt_mask = np.zeros((2, 4), bool)
        gt_mask[:, :2] = True
        gt_classes = np.zeros((2, 4), np.int32)
        votemaps = np.stack([
            targets.draw_votemap(
                gt_boxes[b][gt_mask[b]], gt_classes[b][gt_mask[b]], 1,
                GRID, None, PR, feature_map_stride=8,
            )
            for b in range(2)
        ])
        votemap_flat = jnp.asarray(votemaps.reshape(2, -1, 5))

        def loss_fn(params_all):
            out = head.apply(params_all, x, train=False)
            preds = head.apply(params_all, out,
                               method=E2ESWVoteHead.flatten_preds)
            ld = crit(preds, jnp.asarray(gt_boxes),
                      jnp.asarray(gt_classes), jnp.asarray(gt_mask),
                      votemap_flat)
            return ld["loss"], ld

        (l0, ld0), g = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        assert np.isfinite(float(l0))
        for k in ["loss_ce", "loss_bbox", "loss_vote", "loss_vote_cls",
                  "loss_iou"]:
            assert np.isfinite(float(ld0[k])), k

        # a few SGD steps must reduce the loss
        import optax
        opt = optax.adam(1e-3)
        state = opt.init(variables)
        v = variables
        for _ in range(15):
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(v)
            updates, state = opt.update(g, state)
            v = optax.apply_updates(v, updates)
        (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(v)
        assert float(l1) < float(l0)

    def test_empty_scene(self, rng):
        head, variables, x = init_head(rng)
        coder = CenterCoder()
        crit = SetCriterion(
            box_coder=coder,
            weight_dict={"loss_ce": 1, "loss_bbox": 2},
            losses=["loss_ce", "loss_bbox"],
        )
        out = head.apply(variables, x, train=False)
        preds = head.apply(variables, out, method=E2ESWVoteHead.flatten_preds)
        ld = crit(
            preds, jnp.zeros((2, 4, 7)), jnp.zeros((2, 4), jnp.int32),
            jnp.zeros((2, 4), bool),
        )
        assert np.isfinite(float(ld["loss"]))


class TestZeroInputGradients:
    def test_swin_vote_grads_finite_on_zero_rows(self, rng):
        """Padded (all-zero) cells gave exactly-zero q/k at init; the plain
        L2-norm cosine attention then had NaN gradients (0/0 in the norm
        VJP). Regression for the eps-inside-sqrt fix."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.swin_vote import WindowAttention

        attn = WindowAttention(dim=32, num_heads=2)
        x = jnp.zeros((2, 16, 32))  # all-zero windows (padded region)
        pos = jnp.zeros((2, 16, 2))
        vote = jnp.zeros((2, 16, 3))
        v = attn.init(jax.random.PRNGKey(0), x, pos, vote)

        def loss(params, x):
            return jnp.sum(attn.apply({"params": params}, x, pos, vote) ** 2)

        gp = jax.grad(loss)(v["params"], x)
        leaves = jax.tree_util.tree_leaves(gp)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        gx = jax.grad(loss, argnums=1)(v["params"], x)
        assert bool(jnp.isfinite(gx).all())


class TestBF16Head:
    def test_bf16_head_forward_and_grads(self, rng):
        """compute_dtype='bfloat16': f32 outputs, finite grads, outputs
        close to the f32 path at init."""
        import jax
        import jax.numpy as jnp

        head32 = make_head()
        head16 = E2ESWVoteHead(
            in_channels=32, num_classes=1, grid_size=GRID, pc_range=PR,
            out_size_factor=8, window_size=4, sl_depth=2, num_heads=2,
            compute_dtype="bfloat16",
        )
        x = jnp.asarray(rng.randn(1, 16, 8, 32).astype(np.float32))
        v32 = head32.init(jax.random.PRNGKey(0), x)
        out16, _ = head16.apply(v32, x, train=True, mutable=["batch_stats"])
        out32, _ = head32.apply(v32, x, train=True, mutable=["batch_stats"])
        for k in out16:
            assert out16[k].dtype == jnp.float32, k
            d = np.abs(np.asarray(out16[k] - out32[k]))
            scale = np.abs(np.asarray(out32[k])).max() + 1e-3
            assert d.max() / scale < 0.1, (k, d.max(), scale)

        def loss(p):
            o, _ = head16.apply({"params": p,
                                 "batch_stats": v32["batch_stats"]},
                                x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                       for v in o.values())

        g = jax.grad(loss)(v32["params"])
        assert all(np.isfinite(np.asarray(t)).all()
                   for t in jax.tree_util.tree_leaves(g))


class TestStaticRPECache:
    """Inference-time static-RPE cache: one warmup forward with
    mutable=["rpe_cache"] stores each window-attention's frame-invariant
    (nW, nh, T, T) bias table (region mask folded in); cached frames must
    reproduce the live path (swin_vote.WindowAttention)."""

    def test_cached_forward_matches_live(self, rng):
        head, variables, x = init_head(rng)
        live = head.apply(variables, x, train=False)

        fill_out, upd = head.apply(variables, x, train=False,
                                   mutable=["rpe_cache"])
        # the fill pass itself is behavior-preserving
        for k in live:
            np.testing.assert_allclose(np.asarray(fill_out[k]),
                                       np.asarray(live[k]), atol=1e-6)
        assert "rpe_cache" in upd
        tables = jax.tree_util.tree_leaves(upd["rpe_cache"])
        # sl_depth=2 blocks, each (nW=8, nh=2, T=16, T=16)
        assert len(tables) == 2
        for tbl in tables:
            assert tbl.shape == (8, 2, 16, 16)

        cached_vars = dict(variables)
        cached_vars["rpe_cache"] = upd["rpe_cache"]
        got = head.apply(cached_vars, x, train=False)
        for k in live:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(live[k]), atol=1e-5,
                err_msg=k)

    def test_train_path_ignores_cache(self, rng):
        head, variables, x = init_head(rng)
        live, _ = head.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        _, upd = head.apply(variables, x, train=False,
                            mutable=["rpe_cache"])
        cached_vars = dict(variables)
        cached_vars["rpe_cache"] = upd["rpe_cache"]
        got, _ = head.apply(cached_vars, x, train=True,
                            mutable=["batch_stats"])
        for k in live:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(live[k]), atol=1e-6)



class TestCoderRoutedDecode:
    """predict must decode through the CONFIGURED coder (ADVICE r4 medium:
    the old path hardcoded the cartesian CenterCoder inverse, so a model
    trained with a Polar*/TP coder produced wrong boxes at inference)."""

    def test_default_coder_matches_hardcoded_decode(self, rng):
        from partner_tpu.core.center_coder import CenterCoder
        from partner_tpu.models.e2e_head import (decode_flat_preds,
                                                 decode_head_preds,
                                                 flatten_head_preds,
                                                 head_offset_grid)

        head, variables, x = init_head(rng)
        preds = head.apply(variables, x, train=False)
        grid = head_offset_grid(GRID, PR, 8)
        want_b, want_s = decode_head_preds(preds, grid, iou_factor=1.0)
        flat = flatten_head_preds(preds, grid)
        got_b, got_s = decode_flat_preds(
            flat, CenterCoder(code_size=7, encode_angle_by_sincos=True),
            iou_factor=1.0)
        np.testing.assert_array_equal(np.asarray(want_b), np.asarray(got_b))
        np.testing.assert_array_equal(np.asarray(want_s), np.asarray(got_s))

    def test_polar_coder_roundtrip_through_decode(self, rng):
        """encode -> decode_flat_preds recovers the raw boxes when the
        flat predictions ARE polar encodings (the trained-space contract
        the old hardcoded decode broke)."""
        from partner_tpu.core.center_coder import CenterCoderPolar
        from partner_tpu.models.e2e_head import decode_flat_preds

        coder = CenterCoderPolar(code_size=7, encode_angle_by_sincos=True,
                                 rectify=True)
        boxes = np.stack([
            rng.uniform(5, 30, 12), rng.uniform(-20, 20, 12),
            rng.uniform(-1, 1, 12), rng.uniform(1.5, 5, 12),
            rng.uniform(1.5, 5, 12), rng.uniform(1, 2.5, 12),
            rng.uniform(-np.pi, np.pi, 12),
        ], axis=-1).astype(np.float32)[None]
        # dy >= dx: the polar ratio convention
        dims = np.sort(boxes[..., 3:5], axis=-1)
        boxes[..., 3:5] = dims
        flat = {
            "pred_logits": jnp.zeros((1, 12, 1)),
            "pred_boxes": coder.encode(jnp.asarray(boxes)),
        }
        dec, _ = decode_flat_preds(flat, coder, rectify=True)
        np.testing.assert_allclose(np.asarray(dec[..., :6]),
                                   boxes[..., :6], rtol=1e-4, atol=1e-4)
        dy = np.asarray(
            np.arctan2(np.sin(dec[..., 6] - boxes[..., 6]),
                       np.cos(dec[..., 6] - boxes[..., 6])))
        assert np.abs(dy).max() < 1e-4

    def test_cartesian_rectified_decode_is_true_inverse(self, rng):
        from partner_tpu.core.center_coder import CenterCoder

        coder = CenterCoder(code_size=7, encode_angle_by_sincos=True,
                            rectify=True)
        boxes = np.stack([
            rng.uniform(-30, 30, 16), rng.uniform(-30, 30, 16),
            rng.uniform(-1, 1, 16), rng.uniform(1.5, 5, 16),
            rng.uniform(1.5, 5, 16), rng.uniform(1, 2.5, 16),
            rng.uniform(-np.pi, np.pi, 16),
        ], axis=-1).astype(np.float32)
        dec = np.asarray(coder.decode(coder.encode(jnp.asarray(boxes))))
        np.testing.assert_allclose(dec[..., :6], boxes[..., :6],
                                   rtol=1e-4, atol=1e-4)
        dy = np.arctan2(np.sin(dec[..., 6] - boxes[..., 6]),
                        np.cos(dec[..., 6] - boxes[..., 6]))
        assert np.abs(dy).max() < 1e-4

    def test_rectify_requires_rectifying_coder(self, rng):
        """reference e2e_swv_head.py:345 asserts the same pairing."""
        import pytest

        from partner_tpu.core.center_coder import CenterCoder
        from partner_tpu.models.e2e_head import decode_flat_preds

        flat = {"pred_logits": jnp.zeros((1, 4, 1)),
                "pred_boxes": jnp.zeros((1, 4, 8))}
        with pytest.raises(ValueError, match="rectify"):
            decode_flat_preds(flat, CenterCoder(), rectify=True)

    def test_mttp_multi_anchor_refused_at_build(self):
        """The single-task criterion never threads task_id; a multi-anchor
        MTTP coder must be refused at build time (ADVICE r4 medium)."""
        import pytest

        from partner_tpu.models import build_detector
        from tests.test_detector import tiny_model_cfg

        cfg = tiny_model_cfg()
        cfg["bbox_head"] = dict(cfg["bbox_head"])
        cfg["bbox_head"]["CODER_CONFIG"] = {
            "type": "CenterCoderMTTP",
            "tmp_box": [[4.0, 2.0, 1.6], [1.0, 1.0, 1.7]],
        }
        with pytest.raises(ValueError, match="MTTP"):
            build_detector(cfg)


class TestRematParity:
    """jax.checkpoint'd blocks must be numerically identical to the plain
    path (remat only changes WHEN activations are recomputed); pins the
    static_argnums wiring of nn.remat on both stacks (train-throughput
    lever, tools/probes/train_bwd_anatomy.py)."""

    def test_swin_vote_remat_value_and_grads(self, rng):
        from partner_tpu.models.swin_vote import SwinVoteTransformer

        x = jnp.asarray(rng.randn(1, 16, 8, 32).astype(np.float32))
        pos = jnp.asarray(rng.randn(1, 16, 8, 2).astype(np.float32))
        vote = jnp.asarray(rng.randn(1, 16, 8, 3).astype(np.float32))
        plain = SwinVoteTransformer(embed_dim=32, depth=2, num_heads=2,
                                    window_size=4)
        variables = plain.init(jax.random.PRNGKey(0), x, pos, vote,
                               deterministic=False)
        remat = SwinVoteTransformer(embed_dim=32, depth=2, num_heads=2,
                                    window_size=4, remat=True)

        def loss(m, p):
            return (m.apply({"params": p}, x, pos, vote,
                            deterministic=True) ** 2).sum()

        v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(
            variables["params"])
        v1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(
            variables["params"])
        assert float(v0) == float(v1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_set_block_remat_value_and_grads(self, rng):
        from partner_tpu.models.set_transformer import SetBlockStack

        x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
        pos = jnp.asarray(rng.randn(1, 16, 16, 2).astype(np.float32))
        plain = SetBlockStack(depth=2, num_heads=2, num_keypoints=2,
                              range_window=4, drop=0.0, attn_drop=0.0,
                              drop_path=0.0)
        variables = plain.init(jax.random.PRNGKey(0), x, pos,
                               deterministic=True, train=False)
        remat = SetBlockStack(depth=2, num_heads=2, num_keypoints=2,
                              range_window=4, drop=0.0, attn_drop=0.0,
                              drop_path=0.0, remat=True)

        bs = variables.get("batch_stats", {})

        def loss(m, p):
            return (m.apply({"params": p, "batch_stats": bs}, x, pos,
                            deterministic=True, train=False) ** 2).sum()

        v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(
            variables["params"])
        v1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(
            variables["params"])
        assert float(v0) == float(v1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Parity: the fused Pallas stem kernel == the XLA inference stem."""

import numpy as np
import pytest


class TestStemPallas:
    def test_matches_xla_stem(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.backbone_dense import PolarDenseFHD
        from partner_tpu.ops import stem_pallas

        bb = PolarDenseFHD(num_input_features=7, stem_features=(32, 64),
                           compute_dtype=jnp.float32)  # CPU XLA cannot run bf16 dots
        p = 1000
        x = jnp.asarray(rng.randn(1, 10, p).astype(np.float32))
        mask = jnp.asarray(rng.rand(1, p) > 0.2)

        def xla_stem(bb, x, mask):
            return bb._stem_t(x, mask, train=False)

        variables = bb.init(jax.random.PRNGKey(0), x, mask,
                            method=xla_stem)
        # perturb the BN stats away from the (0, 1) init so the folded
        # affine is non-trivial
        stats = jax.tree_util.tree_map(
            lambda v: v + jnp.abs(jnp.asarray(
                rng.rand(*v.shape), v.dtype)) * 0.3,
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}

        ref = bb.apply(variables, x, mask, method=xla_stem)

        def pallas_stem(bb, x, mask):
            dt = bb.compute_dtype
            eps = 1e-3
            ab = []
            for i in range(2):
                a = bb.stem_scales[i] * jax.lax.rsqrt(
                    bb.stem_vars[i].value + eps)
                ab.append((a, bb.stem_shifts[i]
                           - bb.stem_means[i].value * a))
            fused = lambda xb, mb: stem_pallas.stem2_channel_major(
                xb, mb,
                bb.stem_kernels[0].T.astype(dt), ab[0][0], ab[0][1],
                bb.stem_kernels[1].T.astype(dt), ab[1][0], ab[1][1],
                interpret=True, chunk=256)
            return jax.vmap(fused)(x.astype(dt), mask)

        out = bb.apply(variables, x, mask, method=pallas_stem)
        assert out.shape == ref.shape and out.dtype == ref.dtype
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=1e-5)
        # masked-out points must round-trip identically (garbage-but-equal)
        mrow = np.asarray(mask[0])
        np.testing.assert_allclose(
            np.asarray(out[0, :, ~mrow], np.float32),
            np.asarray(ref[0, :, ~mrow], np.float32), rtol=0, atol=1e-5)

    def test_pad_to_chunk(self, rng):
        """Non-multiple P pads internally and slices back."""
        import jax.numpy as jnp

        from partner_tpu.ops import stem_pallas

        p = 300  # not a multiple of chunk=256
        x = jnp.asarray(rng.randn(10, p).astype(np.float32))
        mask = jnp.asarray(rng.rand(p) > 0.5)
        w1 = jnp.asarray(rng.randn(32, 10).astype(np.float32))
        w2 = jnp.asarray(rng.randn(64, 32).astype(np.float32))
        ones = jnp.ones((32,)); zeros = jnp.zeros((32,))
        ones2 = jnp.ones((64,)); zeros2 = jnp.zeros((64,))
        out = stem_pallas.stem2_channel_major(
            x, mask, w1, ones, zeros, w2, ones2, zeros2,
            interpret=True, chunk=256)
        assert out.shape == (64, p)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

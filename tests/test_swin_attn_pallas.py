"""Parity: fused Pallas vote-Swin attention == the XLA WindowAttention."""

import numpy as np


class TestSwinAttnPallas:
    def _setup(self, rng, nw=6, nh=4, t=16, hd=8, shift_mask=True):
        import jax.numpy as jnp

        q = jnp.asarray(rng.randn(nw, nh, t, hd).astype(np.float32))
        k = jnp.asarray(rng.randn(nw, nh, t, hd).astype(np.float32))
        v = jnp.asarray(rng.randn(nw, nh, t, hd).astype(np.float32))
        pos = jnp.asarray(rng.randn(nw, t, 2).astype(np.float32)) * 10.0
        if shift_mask:
            regions = rng.randint(0, 3, (nw, t))
            diff = regions[:, :, None] != regions[:, None, :]
            mask = jnp.asarray(np.where(diff, -100.0, 0.0).astype(np.float32))
        else:
            mask = jnp.zeros((nw, t, t), jnp.float32)
        w1 = jnp.asarray(rng.randn(2, 16).astype(np.float32)) * 0.3
        b1 = jnp.asarray(rng.randn(16).astype(np.float32)) * 0.1
        w2 = jnp.asarray(rng.randn(16, nh).astype(np.float32)) * 0.3
        b2 = jnp.asarray(rng.randn(nh).astype(np.float32)) * 0.1
        tau = jnp.asarray(np.abs(rng.rand(nh)).astype(np.float32) + 0.2)
        return q, k, v, pos, mask, w1, b1, w2, b2, tau

    def _xla_ref(self, q, k, v, pos, mask, w1, b1, w2, b2, tau):
        import jax
        import jax.numpy as jnp

        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        qn = jnp.sqrt(jnp.sum(qf * qf, -1, keepdims=True) + 1e-12)
        kn = jnp.sqrt(jnp.sum(kf * kf, -1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) / (
            qn * kn.transpose(0, 1, 3, 2))
        attn = attn / tau[None, :, None, None]
        rel = pos[:, :, None, :] - pos[:, None, :, :]
        hidden = jnp.maximum(rel @ w1 + b1, 0.0)
        rpe = hidden @ w2 + b2
        attn = attn + rpe.transpose(0, 3, 1, 2)
        attn = attn + mask[:, None]
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                          preferred_element_type=jnp.float32)

    def test_matches_xla(self, rng):
        from partner_tpu.ops.swin_attn_pallas import swin_vote_attention

        args = self._setup(rng)
        ref = np.asarray(self._xla_ref(*args), np.float32)
        out = np.asarray(swin_vote_attention(*args, interpret=True, g=2),
                         np.float32)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_zero_mask_and_window_padding(self, rng):
        """nw not divisible by g: internal padding windows are discarded."""
        from partner_tpu.ops.swin_attn_pallas import swin_vote_attention

        args = self._setup(rng, nw=5, shift_mask=False)
        ref = np.asarray(self._xla_ref(*args), np.float32)
        out = np.asarray(swin_vote_attention(*args, interpret=True, g=2),
                         np.float32)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        # mask=None path (unshifted blocks): no dense zeros streamed
        a2 = list(args)
        a2[4] = None
        out2 = np.asarray(swin_vote_attention(*a2, interpret=True, g=2),
                          np.float32)
        np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)

    def test_module_kernel_path_matches_xla_path(self, rng):
        """WindowAttention with the kernel forced on == the XLA branch."""
        import jax
        import jax.numpy as jnp

        from partner_tpu.models import swin_vote as sv

        x = jnp.asarray(rng.randn(4, 16, 256).astype(np.float32))
        pos = jnp.asarray(rng.randn(4, 16, 2).astype(np.float32)) * 5
        vote = jnp.asarray(rng.randn(4, 16, 3).astype(np.float32))
        m = sv.WindowAttention(dim=256, num_heads=4)
        variables = m.init(jax.random.PRNGKey(0), x, pos, vote)
        ref = m.apply(variables, x, pos, vote, deterministic=True)

        orig_avail = sv.swin_attn_pallas.available
        orig_call = sv.swin_attn_pallas.swin_vote_attention
        try:
            sv.swin_attn_pallas.available = lambda: True
            sv.swin_attn_pallas.swin_vote_attention = (
                lambda *a, **kw: orig_call(*a, interpret=True, g=2))
            out = m.apply(variables, x, pos, vote, deterministic=True)
        finally:
            sv.swin_attn_pallas.available = orig_avail
            sv.swin_attn_pallas.swin_vote_attention = orig_call
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

"""Whole-block fused SwinVote kernel vs the XLA flax block (interpret
mode on CPU; the on-chip A/B lives in tools/probes/swin_block_ab.py)."""

import numpy as np
import pytest


def _params_from_block(variables, block="block0"):
    """flax SwinVoteTransformer params -> the kernel's flat param dict."""
    p = variables["params"][block]
    a = p["attn"]
    return {
        "ln1": p["norm1"], "ln2": p["norm2"],
        "qkv": a["qkv"], "proj": a["proj"],
        "vote_mlp": a["vote_mlp"], "rpe": a["rpe"], "tau": a["tau"],
        "mlp_fc1": p["mlp_fc1"], "mlp_fc2": p["mlp_fc2"],
    }


class TestSwinBlockKernelParity:
    def _setup(self, rng, h=16, w=8, c=32, nh=2, ws=4):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.swin_vote import SwinVoteTransformer

        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        pos = jnp.asarray(rng.randn(2, h, w, 2).astype(np.float32))
        vote = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        m = SwinVoteTransformer(embed_dim=c, depth=2, num_heads=nh,
                                window_size=ws)
        variables = m.init(jax.random.PRNGKey(0), x, pos, vote,
                           deterministic=True)
        return m, variables, x, pos, vote

    def test_unshifted_block_matches_flax(self, rng):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.swin_vote import SwinVoteBlock
        from partner_tpu.ops.swin_block_pallas import swin_vote_block

        nh, ws, c = 2, 4, 32
        m, variables, x, pos, vote = self._setup(rng, nh=nh, ws=ws, c=c)
        blk = SwinVoteBlock(c, nh, ws, shift_size=0)
        bp = {"params": variables["params"]["block0"]}
        want = blk.apply(bp, x, pos, vote, True)

        got = swin_vote_block(
            x, pos, vote, None, _params_from_block(variables, "block0"),
            nh=nh, ws=ws, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_shifted_block_matches_flax(self, rng):
        """Shift handled by pre/post rolls outside the kernel + the
        region mask inside; must equal the flax shifted block."""
        import jax.numpy as jnp

        from partner_tpu.models.swin_vote import (SwinVoteBlock,
                                                  swin_attn_mask)
        from partner_tpu.ops.swin_block_pallas import swin_vote_block

        nh, ws, c, h, w = 2, 4, 32, 16, 8
        shift = ws // 2
        m, variables, x, pos, vote = self._setup(rng, h=h, w=w, nh=nh,
                                                 ws=ws, c=c)
        blk = SwinVoteBlock(c, nh, ws, shift_size=shift)
        bp = {"params": variables["params"]["block1"]}
        want = blk.apply(bp, x, pos, vote, True)

        roll = lambda t: jnp.roll(t, (-shift, -shift), axis=(1, 2))
        mask = swin_attn_mask(h, w, ws, shift)
        got = swin_vote_block(
            roll(x), roll(pos), roll(vote), mask,
            _params_from_block(variables, "block1"), nh=nh, ws=ws,
            interpret=True)
        got = jnp.roll(got, (shift, shift), axis=(1, 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_full_transformer_fast_path(self, rng):
        """SwinVoteTransformer with the whole-block kernel enabled equals
        the plain path (both blocks + patch embed + norms)."""
        from partner_tpu.models.swin_vote import SwinVoteTransformer

        m, variables, x, pos, vote = self._setup(rng)
        want = m.apply(variables, x, pos, vote, deterministic=True)
        fused = SwinVoteTransformer(
            embed_dim=32, depth=2, num_heads=2, window_size=4,
            use_block_kernel=True, block_kernel_interpret=True)
        got = fused.apply(variables, x, pos, vote, deterministic=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

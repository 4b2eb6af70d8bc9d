import numpy as np
import jax
import jax.numpy as jnp

from partner_tpu.models.set_transformer import SetBlockStack
from partner_tpu.models.swin_vote import SwinVoteTransformer


class TestSetBlock:
    def _make(self, rng, h=16, w=32, c=32, depth=2):
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        pos = jnp.asarray(rng.randn(2, h, w, 2).astype(np.float32))
        model = SetBlockStack(depth=depth, num_heads=4, num_keypoints=4,
                              range_window=8)
        variables = model.init(jax.random.PRNGKey(0), x, pos,
                               deterministic=True, train=False)
        return model, variables, x, pos

    def test_shape_preserved(self, rng):
        model, variables, x, pos = self._make(rng)
        y = model.apply(variables, x, pos, deterministic=True, train=False)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_not_identity(self, rng):
        model, variables, x, pos = self._make(rng)
        y = model.apply(variables, x, pos, deterministic=True, train=False)
        assert float(jnp.abs(y - x).max()) > 1e-3

    def test_azimuth_roll_equivariance_window_multiple(self, rng):
        """Rolling the azimuth axis by a full range-window must commute with
        the unshifted single block (window structure is translation-
        equivariant in steps of the window size)."""
        rng2 = np.random.RandomState(1)
        x = jnp.asarray(rng2.randn(1, 8, 32, 16).astype(np.float32))
        pos = jnp.asarray(rng2.randn(1, 8, 32, 2).astype(np.float32))
        model = SetBlockStack(depth=1, num_heads=4, num_keypoints=2,
                              range_window=8)
        variables = model.init(jax.random.PRNGKey(0), x, pos,
                               deterministic=True, train=False)
        y = model.apply(variables, x, pos, deterministic=True, train=False)
        xr = jnp.roll(x, 8, axis=2)
        pr = jnp.roll(pos, 8, axis=2)
        yr = model.apply(variables, xr, pr, deterministic=True, train=False)
        np.testing.assert_allclose(
            np.asarray(jnp.roll(y, 8, axis=2)), np.asarray(yr),
            rtol=1e-3, atol=1e-4,
        )

    def test_grad_flows(self, rng):
        model, variables, x, pos = self._make(rng, depth=1)

        def loss(v):
            return model.apply(v, x, pos, deterministic=True,
                               train=False).sum()

        g = jax.grad(loss)(variables)
        leaves = jax.tree_util.tree_leaves(g["params"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestSwinVote:
    def test_shapes_with_padding(self, rng):
        # 18x10 grid is not a multiple of window 7 -> exercises padding
        x = jnp.asarray(rng.randn(2, 18, 10, 24).astype(np.float32))
        pos = jnp.asarray(rng.randn(2, 18, 10, 2).astype(np.float32))
        vote = jnp.asarray(rng.randn(2, 18, 10, 3).astype(np.float32))
        model = SwinVoteTransformer(embed_dim=16, depth=2, num_heads=4,
                                    window_size=7)
        variables = model.init(jax.random.PRNGKey(0), x, pos, vote)
        y = model.apply(variables, x, pos, vote)
        assert y.shape == (2, 18, 10, 16)
        assert np.isfinite(np.asarray(y)).all()

    def test_vote_embedding_changes_output(self, rng):
        x = jnp.asarray(rng.randn(1, 14, 14, 16).astype(np.float32))
        pos = jnp.asarray(rng.randn(1, 14, 14, 2).astype(np.float32))
        v1 = jnp.zeros((1, 14, 14, 3))
        v2 = jnp.ones((1, 14, 14, 3))
        model = SwinVoteTransformer(embed_dim=16, depth=1, num_heads=2)
        variables = model.init(jax.random.PRNGKey(0), x, pos, v1)
        y1 = model.apply(variables, x, pos, v1)
        y2 = model.apply(variables, x, pos, v2)
        assert float(jnp.abs(y1 - y2).max()) > 1e-4


class TestDecomposedPosBias:
    """decompose_pos_mlp must reproduce the direct per-pair PosEmbedMLP
    bias at inference (BN folded as a per-channel affine)."""

    def test_matches_direct_pair_path(self, rng):
        from partner_tpu.models.layers import PosEmbedMLP, decompose_pos_mlp

        mlp = PosEmbedMLP(4)
        pos_a = jnp.asarray(rng.randn(2, 5, 7, 2).astype(np.float32))
        pos_b = jnp.asarray(rng.randn(2, 9, 7, 2).astype(np.float32))
        rel = pos_a[:, :, None] - pos_b[:, None, :]  # (2,5,9,7,2)
        variables = mlp.init(jax.random.PRNGKey(0), rel, train=True)
        # make running stats non-trivial (fresh init has mean 0 / var 1)
        variables = jax.tree_util.tree_map(lambda v: v, variables)
        bs = variables["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]
        bs["mean"] = jnp.asarray(rng.randn(16).astype(np.float32)) * 0.3
        bs["var"] = jnp.asarray(
            np.abs(rng.randn(16)).astype(np.float32)) + 0.5

        direct = mlp.apply(variables, rel, train=False)

        def decomposed(vs):
            bound = mlp.bind(vs)
            bound(jnp.zeros((1, 2), jnp.float32), train=False)
            proj, finish = decompose_pos_mlp(bound, jnp.float32)
            return finish(proj(pos_a)[:, :, None] - proj(pos_b)[:, None, :])

        got = decomposed(variables)
        np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                                   rtol=2e-5, atol=2e-5)

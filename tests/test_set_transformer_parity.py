"""PARTNER re-alignment attention: torch -> flax weight-conversion parity.

The reference SetBlock (det3d/models/utils/set_transformer.py) is pure
torch and runnable on CPU. Its RangeAttention subpath is layout-correct,
so converted weights must reproduce activations exactly; the two Sector
attentions contain the documented token/channel scramble
(``view(B, C, H, W)`` on a (B, L, C) tensor, set_transformer.py:333-336 /
417-427 — see models/set_transformer.py:19-23), so for those we assert
the state_dict maps 1:1 onto our parameter tree and the keypoint
*selection* matches, which pins down everything except the deliberately
fixed layout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import load_reference_set_transformer  # noqa: E402

from partner_tpu.train import torch_convert as tc  # noqa: E402


@pytest.fixture(scope="module")
def ref_st():
    try:
        return load_reference_set_transformer()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference tree unavailable: {e}")


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.asarray(v).shape)
    return out


class TestRangeAttentionParity:
    def test_activation_parity(self, ref_st, rng):
        """Exact: reference RangeAttention on (B, L, C) h-major tokens vs
        our windowed einsum version on (B, Hk, W, C)."""
        import jax

        from partner_tpu.models.set_transformer import RangeAttention

        dim, heads, hk, w = 32, 4, 4, 16
        ref = ref_st.RangeAttention(
            dim, resolution=(hk, w), H_sp=hk, W_sp=8, num_heads=heads,
            dim_out=dim, qkv_bias=True, drop=0.0, attn_drop=0.0,
            drop_path=0.0)
        ref.eval()

        s = rng.randn(2, hk, w, dim).astype(np.float32)
        pos = rng.randn(2, hk, w, 2).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(s.reshape(2, hk * w, dim)),
                       torch.from_numpy(pos)).numpy().reshape(2, hk, w, dim)

        params, stats = tc.convert_range_attention_state_dict(
            ref.state_dict())
        # exact erf GELU to match torch's default activation
        ours = RangeAttention(num_heads=heads, window_w=8,
                              gelu_approx=False)
        got = ours.apply({"params": params, "batch_stats": stats},
                         s, pos, deterministic=True, train=False)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)


class TestSetAttentionConversion:
    def _ref_block(self, ref_st, dim=32, heads=4, hk=4, h=8, w=16,
                   shift=False):
        return ref_st.SetAttention(
            dim, resolution=(h, w), H_sp=h, W_sp=1, H=hk, W=8,
            num_heads=heads, dim_out=dim, qkv_bias=True,
            drop=0.0, attn_drop=0.0, drop_path=0.0, shift=shift)

    def test_state_dict_maps_onto_our_tree(self, ref_st, rng):
        """Every converted tensor lands on a same-shaped slot of our
        SetAttention parameter tree (full-block mapping coverage)."""
        import jax

        from partner_tpu.models.set_transformer import SetAttention

        dim, heads, hk, h, w = 32, 4, 4, 8, 16
        ref = self._ref_block(ref_st, dim, heads, hk, h, w)
        params, stats = tc.convert_set_attention_state_dict(ref.state_dict())

        ours = SetAttention(num_heads=heads, num_keypoints=hk,
                            range_window=8, shift=False)
        x = rng.randn(1, h, w, dim).astype(np.float32)
        pos = rng.randn(1, h, w, 2).astype(np.float32)
        variables = ours.init(jax.random.PRNGKey(0), x, pos,
                              deterministic=True, train=False)

        want_shapes = _tree_shapes(variables["params"])
        got_shapes = _tree_shapes(params)
        assert got_shapes == want_shapes

        bs_want = _tree_shapes(variables.get("batch_stats", {}))
        bs_got = _tree_shapes(stats)
        assert bs_got == bs_want

        # converted weights run through our forward
        out = ours.apply({"params": params, "batch_stats": stats}, x, pos,
                         deterministic=True, train=False)
        assert np.isfinite(np.asarray(out)).all()
        assert out.shape == x.shape

    def test_keypoint_selection_matches_reference(self, ref_st, rng):
        """The keypoint indices our top-k picks equal the reference's
        masked-argsort selection (set_transformer.py:134-148) on the same
        saliency map."""
        import torch.nn.functional as F

        import jax
        import jax.numpy as jnp

        h, w, hk = 12, 6, 4
        x = rng.randn(2, h, w, 8).astype(np.float32)

        # reference selection (verbatim semantics)
        xt = torch.from_numpy(x)
        s = xt.mean(dim=3)                      # (B, H, W)
        s = s.permute(0, 2, 1)                  # (B, W, H)
        local_max = torch.zeros_like(s)
        inner = F.max_pool1d(s, kernel_size=3, stride=1, padding=0)
        local_max[:, :, 1:-1] = inner
        s = s * (local_max == s)
        s = s.permute(0, 2, 1)                  # (B, H, W)
        want = s.argsort(dim=1, descending=True)[:, :hk, :].numpy()

        # our selection (same ops as SetAttention.__call__)
        sal = jnp.asarray(x).mean(-1)
        inner_j = jax.lax.reduce_window(
            sal, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "VALID")
        lm = jnp.zeros_like(sal).at[:, 1:-1, :].set(inner_j)
        sal = jnp.where(lm == sal, sal, 0.0)
        _, top_idx = jax.lax.top_k(sal.transpose(0, 2, 1), hk)
        got = np.asarray(top_idx.transpose(0, 2, 1))

        # same index SETS per column (ordering may differ on exact ties)
        np.testing.assert_array_equal(np.sort(got, axis=1),
                                      np.sort(want, axis=1))


class TestPosEmbedParity:
    def test_conv1d_stack_parity(self, ref_st, rng):
        """Reference Conv1d(2,16,1)-BN-ReLU-Conv1d stack == our
        PosEmbedMLP on the same relative positions."""
        from partner_tpu.models.layers import PosEmbedMLP

        heads = 4
        ref = ref_st.RangeAttention(
            16, resolution=(4, 8), H_sp=4, W_sp=8, num_heads=heads,
            qkv_bias=True)
        ref.eval()
        stack = ref.pos_embedding_cart

        rel = rng.randn(3, 10, 10, 2).astype(np.float32)
        with torch.no_grad():
            # torch wants (N, 2, L)
            t = torch.from_numpy(rel.reshape(3, 100, 2).transpose(0, 2, 1))
            want = stack(t).numpy().transpose(0, 2, 1).reshape(
                3, 10, 10, heads)

        params, stats = tc._pos_mlp(
            {k: v for k, v in ref.state_dict().items()
             if k.startswith("pos_embedding_cart")},
            "pos_embedding_cart")
        got = PosEmbedMLP(heads).apply(
            {"params": params, "batch_stats": stats},
            rel, False)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

"""CSWin block: shapes, stripe round-trip, attention semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from partner_tpu.models.cswin import CSWinBlock, LePEAttention, _stripes, \
    _unstripes


def test_stripe_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    for h_sp, w_sp in [(1, 12), (8, 1), (4, 4), (2, 6)]:
        y = _unstripes(_stripes(x, h_sp, w_sp), h_sp, w_sp, 8, 12)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_cswin_block_forward(rng):
    blk = CSWinBlock(num_heads=4)
    x = jnp.asarray(rng.randn(2, 8, 16, 32).astype(np.float32))
    pos = jnp.asarray(rng.randn(8, 16, 2).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x, pos)
    y = blk.apply(variables, x, pos)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # both stripe branches exist (cross-shaped window)
    assert "attn_row" in variables["params"]
    assert "attn_col" in variables["params"]


def test_cswin_last_stage_square_windows(rng):
    blk = CSWinBlock(num_heads=4, split_size=4, last_stage=True)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(variables, x)
    assert y.shape == x.shape
    # single square-window branch: no row/col split params
    assert "attn_row" not in variables["params"]
    assert "attn_col" not in variables["params"]


def test_row_stripe_attention_is_rowwise(rng):
    """idx=0 attention mixes only within rows: changing one row leaves
    other rows' outputs untouched."""
    attn = LePEAttention(idx=0, num_heads=2)
    q = jnp.asarray(rng.randn(1, 6, 10, 8).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), q, q, q)
    y0 = attn.apply(variables, q, q, q)
    q2 = q.at[:, 3].add(10.0)
    y1 = attn.apply(variables, q2, q2, q2)
    d = np.abs(np.asarray(y1 - y0))
    assert d[:, 3].max() > 1e-4           # the changed row moved
    mask = np.ones(6, bool); mask[3] = False
    np.testing.assert_allclose(d[:, mask], 0.0, atol=1e-5)


def test_col_stripe_attention_is_colwise(rng):
    attn = LePEAttention(idx=1, num_heads=2)
    q = jnp.asarray(rng.randn(1, 6, 10, 8).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), q, q, q)
    y0 = attn.apply(variables, q, q, q)
    q2 = q.at[:, :, 7].add(10.0)
    y1 = attn.apply(variables, q2, q2, q2)
    d = np.abs(np.asarray(y1 - y0))
    assert d[:, :, 7].max() > 1e-4
    mask = np.ones(10, bool); mask[7] = False
    np.testing.assert_allclose(d[:, :, mask], 0.0, atol=1e-5)


def test_pos_bias_changes_attention(rng):
    attn = LePEAttention(idx=0, num_heads=2)
    q = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    pos = jnp.asarray(rng.randn(4, 8, 2).astype(np.float32))
    v_with = attn.init(jax.random.PRNGKey(0), q, q, q, pos)
    y_pos = attn.apply(v_with, q, q, q, pos)
    y_zero_pos = attn.apply(v_with, q, q, q, jnp.zeros_like(pos))
    assert np.abs(np.asarray(y_pos - y_zero_pos)).max() > 1e-6

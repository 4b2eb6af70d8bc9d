"""Fused inference branch-head parity: the horizontally fused conv path
(one wide conv1 + block-diagonal conv2, e2e_head._fused_branches) must
match the unfused per-branch modules exactly on the same variables."""

import numpy as np
import pytest


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_fused_branch_heads_match_unfused(rng, monkeypatch, compute_dtype):
    import jax
    import jax.numpy as jnp

    from partner_tpu.models.e2e_head import E2ESWVoteHead

    head = E2ESWVoteHead(
        in_channels=64, grid_size=(64, 128, 16),
        pc_range=(0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8),
        window_size=4, num_classes=2, compute_dtype=compute_dtype,
    )
    x = jnp.asarray(rng.randn(1, 16, 8, 64).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    # non-trivial BN running stats so the affine fold is exercised
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(rng.rand(*v.shape), v.dtype) * 0.3,
        variables["batch_stats"],
    )
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "0")
    ref = head.apply(variables, x, train=False)
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "1")
    got = head.apply(variables, x, train=False)
    tol = 2e-5 if compute_dtype == "float32" else 5e-2
    for k in ref:
        d = float(jnp.abs(ref[k].astype(jnp.float32)
                          - got[k].astype(jnp.float32)).max())
        assert d < tol, (k, d)


def test_sep_head_fused_matches_unfused(rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    from partner_tpu.models.center_head import SepHead

    heads = dict(reg=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2),
                 vel=(2, 2), hm=(3, 2))
    head = SepHead(heads=tuple(heads.items()))
    x = jnp.asarray(rng.randn(2, 8, 8, 96).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "0")
    ref = head.apply(variables, x, train=False)
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "1")
    got = head.apply(variables, x, train=False)
    assert set(ref) == set(got) == set(heads)
    for k in ref:
        assert ref[k].shape == got[k].shape == x.shape[:3] + (heads[k][0],)
        d = float(jnp.abs(ref[k] - got[k]).max())
        assert d < 2e-5, (k, d)


def test_sep_head_heterogeneous_depth_falls_back(rng, monkeypatch):
    """num_conv != 2 anywhere -> unfused path (exactness over cleverness)."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models.center_head import SepHead

    head = SepHead(heads=(("reg", (2, 3)), ("hm", (1, 2))))
    x = jnp.asarray(rng.randn(1, 4, 4, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "1")
    out = head.apply(variables, x, train=False)
    assert out["reg"].shape == (1, 4, 4, 2)


def test_train_path_stays_unfused(rng):
    """Training keeps per-branch modules (autodiff + BN batch stats)."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models.e2e_head import E2ESWVoteHead

    head = E2ESWVoteHead(
        in_channels=64, grid_size=(64, 128, 16),
        pc_range=(0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8),
        window_size=4,
    )
    x = jnp.asarray(rng.randn(1, 16, 8, 64).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    out, updates = head.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    assert "hm" in out and "batch_stats" in updates


def test_kernel_size_5_falls_back_to_unfused(rng, monkeypatch):
    """kernel_size != 3 mixes 5x5 ConvHead conv1 with ConvBNHead's fixed
    3x3 conv1 — fusion must detect the mismatch and fall back to the
    unfused path instead of crashing (advisor finding)."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models.e2e_head import E2ESWVoteHead

    head = E2ESWVoteHead(
        in_channels=64, grid_size=(64, 128, 16),
        pc_range=(0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8),
        window_size=4, num_classes=1, kernel_size=5,
    )
    x = jnp.asarray(rng.randn(1, 16, 8, 64).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x, train=True)
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "1")
    got = head.apply(variables, x, train=False)  # must not raise
    monkeypatch.setenv("PARTNER_TPU_FUSED_HEAD", "0")
    ref = head.apply(variables, x, train=False)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-6, err_msg=k)

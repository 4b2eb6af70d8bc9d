"""Deformable conv: zero-offset == dense conv; DCNSepHead wiring.

Covers the TPU-native replacement for the reference DCN CUDA kernels
(/root/reference/det3d/ops/dcn/, wrapped by FeatureAdaption/DCNSepHead at
det3d/models/bbox_heads/center_head.py:25-63,111-163).
"""

import jax
import jax.numpy as jnp
import numpy as np

from partner_tpu.ops.deform_conv import bilinear_sample_nhwc, deform_conv2d


def test_zero_offset_equals_dense_conv(rng):
    """With zero offsets, deformable conv is an exact SAME-padding conv."""
    b, h, w, c, co = 2, 9, 11, 6, 4
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wts = jnp.asarray(rng.randn(9, c, co).astype(np.float32) * 0.1)
    offsets = jnp.zeros((b, h, w, 1 * 9 * 2), jnp.float32)
    got = deform_conv2d(x, offsets, wts, kernel=3, deformable_groups=1)

    # lax conv oracle: weights (K, C, Cout) -> HWIO (3, 3, C, Cout)
    w_hwio = wts.reshape(3, 3, c, co)
    want = jax.lax.conv_general_dilated(
        x, w_hwio, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_taps(rng):
    """A (+1, 0) offset on every tap equals sampling one row lower."""
    b, h, w, c = 1, 8, 8, 3
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wts = jnp.zeros((9, c, c), jnp.float32)
    # identity kernel: center tap passes channels through
    wts = wts.at[4].set(jnp.eye(c))
    off = jnp.zeros((b, h, w, 18), jnp.float32).at[..., 0::2].set(1.0)
    got = deform_conv2d(x, off, wts, kernel=3, deformable_groups=1)
    # center tap at (y+1, x): rows shift up, last row zero-padded
    want = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fractional_offset_bilinear(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    ys = jnp.full((1, 6, 6, 1), 2.5)
    xs = jnp.full((1, 6, 6, 1), 3.0)
    s = bilinear_sample_nhwc(x, ys, xs)
    want = 0.5 * (x[0, 2, 3] + x[0, 3, 3])
    np.testing.assert_allclose(np.asarray(s[0, 0, 0, 0]), np.asarray(want),
                               rtol=1e-5)


def test_out_of_bounds_is_zero(rng):
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    ys = jnp.full((1, 4, 4, 1), -3.0)
    xs = jnp.full((1, 4, 4, 1), 1.0)
    s = bilinear_sample_nhwc(x, ys, xs)
    np.testing.assert_allclose(np.asarray(s), 0.0)


def test_modulated_mask_scales(rng):
    b, h, w, c = 1, 5, 5, 2
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wts = jnp.asarray(rng.randn(9, c, c).astype(np.float32) * 0.1)
    off = jnp.zeros((b, h, w, 18), jnp.float32)
    big = jnp.full((b, h, w, 9), 40.0)   # sigmoid -> 1
    tiny = jnp.full((b, h, w, 9), -40.0)  # sigmoid -> 0
    base = deform_conv2d(x, off, wts)
    m1 = deform_conv2d(x, off, wts, mask=big)
    m0 = deform_conv2d(x, off, wts, mask=tiny)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m0), 0.0, atol=1e-6)


def test_dcn_sep_head_forward_and_grad(rng):
    from partner_tpu.models.center_head import DCNSepHead

    head = DCNSepHead(num_cls=3, heads={"reg": (2, 2), "height": (1, 2)})
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    out, _ = head.apply(variables, x, train=True,
                        mutable=["batch_stats"])
    assert out["hm"].shape == (2, 16, 16, 3)
    assert out["reg"].shape == (2, 16, 16, 2)
    assert out["height"].shape == (2, 16, 16, 1)

    def loss(params):
        o, _ = head.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(v ** 2) for v in o.values())

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # offset convs are zero-initialized (reference init_offset)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["feature_adapt_cls"]["conv_offset"]
                   ["kernel"]), 0.0)


def test_center_head_dcn_flag(rng):
    from partner_tpu.models.center_head import CenterHead

    head = CenterHead(
        tasks=({"class_names": ["car"]},),
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2)},
        dcn_head=True,
    )
    x = jnp.asarray(rng.randn(1, 8, 8, 64).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    out, _ = head.apply(variables, x, train=True, mutable=["batch_stats"])
    preds = out["det_preds"][0]
    assert preds["hm"].shape == (1, 8, 8, 1)
    assert preds["rot"].shape == (1, 8, 8, 2)

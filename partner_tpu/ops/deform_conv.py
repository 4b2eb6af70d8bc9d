"""Deformable convolution v1/v2 as bilinear gather + matmul.

TPU-native equivalent of the reference's DCN CUDA kernels
(/root/reference/det3d/ops/dcn/src/deform_conv_cuda_kernel.cu, wrapped at
ops/dcn/deform_conv.py:14-434). Instead of the im2col-with-offsets CUDA
kernel, each kernel tap samples the input at
``p + tap_offset + learned_offset`` with bilinear interpolation (zeros
outside the image, like the CUDA kernel), producing a (B, H, W, K, C)
sampled tensor that contracts with the (K, C, Cout) weight on the MXU.

Offset channel layout matches torch DCN: per deformable group, per tap,
(dy, dx) pairs — offsets[..., g, k, 0] = dy, [..., 1] = dx. The v2
("modulated") variant multiplies each tap's sample by a sigmoid mask.
"""

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(x, ys, xs):
    """Sample x (B, H, W, C) at float coords (ys, xs) each (B, H, W, K).

    Returns (B, H, W, K, C); out-of-bounds contributions are zero (the DCN
    CUDA kernel's behavior)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0  # weight of the +1 row
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    xf = x.reshape(b, h * w, c)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # (B,H,W,K)
        g = jnp.take_along_axis(
            xf[:, :, None, :], lin.reshape(b, -1)[..., None, None], axis=1
        )  # (B, H*W*K, 1, C)
        g = g.reshape(yi.shape + (c,))
        return g * valid[..., None]

    v00 = tap(y0i, x0i) * ((1 - wy1) * (1 - wx1))[..., None]
    v01 = tap(y0i, x0i + 1) * ((1 - wy1) * wx1)[..., None]
    v10 = tap(y0i + 1, x0i) * (wy1 * (1 - wx1))[..., None]
    v11 = tap(y0i + 1, x0i + 1) * (wy1 * wx1)[..., None]
    return v00 + v01 + v10 + v11


def deform_conv2d(x, offsets, weights, bias=None, kernel=3,
                  deformable_groups=1, mask=None):
    """Deformable 2D convolution, stride 1, SAME padding.

    Args:
      x: (B, H, W, C) input.
      offsets: (B, H, W, G*K*2) learned offsets, torch layout (see module
        docstring); G = deformable_groups, K = kernel*kernel.
      weights: (K, C, Cout).
      bias: optional (Cout,).
      mask: optional (B, H, W, G*K) modulation logits (DCN v2); sigmoid is
        applied here.

    Returns (B, H, W, Cout).
    """
    b, h, w, c = x.shape
    g = deformable_groups
    k = kernel * kernel
    assert offsets.shape[-1] == g * k * 2, (offsets.shape, g, k)
    assert c % g == 0

    pad = (kernel - 1) // 2
    ky, kx = jnp.meshgrid(jnp.arange(kernel) - pad, jnp.arange(kernel) - pad,
                          indexing="ij")
    ky = ky.reshape(-1).astype(x.dtype)  # (K,)
    kx = kx.reshape(-1).astype(x.dtype)

    base_y = jnp.arange(h, dtype=x.dtype)[None, :, None, None]
    base_x = jnp.arange(w, dtype=x.dtype)[None, None, :, None]

    off = offsets.reshape(b, h, w, g, k, 2)
    ys = base_y[..., None] + ky[None, None, None, None] + off[..., 0]
    xs = base_x[..., None] + kx[None, None, None, None] + off[..., 1]
    # ys/xs: (B, H, W, G, K)

    cg = c // g
    xg = x.reshape(b, h, w, g, cg)
    sampled = []
    for gi in range(g):  # G is small (1 or 4); unrolled gathers
        s = bilinear_sample_nhwc(xg[..., gi, :], ys[..., gi, :],
                                 xs[..., gi, :])  # (B,H,W,K,cg)
        if mask is not None:
            m = jnp.reshape(mask, (b, h, w, g, k))[..., gi, :]
            s = s * jax.nn.sigmoid(m)[..., None]
        sampled.append(s)
    samp = jnp.stack(sampled, axis=-2)  # (B, H, W, K, G, cg)
    samp = samp.reshape(b, h, w, k, c)

    out = jnp.einsum("bhwkc,kco->bhwo", samp, weights,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out

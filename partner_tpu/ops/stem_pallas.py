"""Fused point-stem Pallas TPU kernel.

The flagship's point fast path runs a 2-layer channel-major MLP stem over
the padded point buffer (backbone_dense.PolarDenseFHD._stem_t). As plain
XLA ops the inference stem costs ~1.05 ms/frame for ~1 GFLOP — each
matmul/mask/normalize/relu stage is a separate pass over the (64, 216k)
activations. This kernel fuses both layers (matmul + mask + folded
BatchNorm affine + ReLU) into one VMEM-resident pass per point chunk:
one HBM read of the decorated points, one HBM write of the stem features.

Numerics match the XLA path including its bf16 round-trips: einsum
accumulates f32 -> cast to the compute dtype -> mask -> normalize in f32
-> ReLU -> cast. The inference BatchNorm folds to t * a + b with
a = scale * rsqrt(var + eps), b = shift - mean * a.

Used at inference only (training keeps the XLA stem: BN batch stats +
autodiff); parity is asserted in tests/test_stem_pallas.py via
interpret mode on CPU.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def available():
    """Use the fused kernel? Non-CPU backend + opt-in env. Default OFF:
    the on-chip A/B (2026-08-19) measured the combined Pallas path as a
    large frame-scale LOSS (29.3 vs 48.6 FPS with both kernels on).
    PARTNER_TPU_PALLAS=1 enables both kernels; PARTNER_TPU_PALLAS_STEM
    enables/disables this one individually for attribution."""
    flag = os.environ.get("PARTNER_TPU_PALLAS_STEM",
                          os.environ.get("PARTNER_TPU_PALLAS", "0"))
    return jax.default_backend() != "cpu" and flag == "1"


def _kernel(x_ref, m_ref, w1_ref, a1_ref, b1_ref, w2_ref, a2_ref, b2_ref,
            o_ref):
    cdt = o_ref.dtype
    m = m_ref[:].astype(cdt)                       # (1, T)
    t = jnp.dot(w1_ref[:], x_ref[:],
                preferred_element_type=jnp.float32)  # (F1, T) f32
    t = (t.astype(cdt) * m).astype(jnp.float32)
    t = t * a1_ref[:] + b1_ref[:]
    t = jnp.maximum(t, 0.0).astype(cdt)
    t2 = jnp.dot(w2_ref[:], t, preferred_element_type=jnp.float32)
    t2 = (t2.astype(cdt) * m).astype(jnp.float32)
    t2 = t2 * a2_ref[:] + b2_ref[:]
    o_ref[:] = jnp.maximum(t2, 0.0).astype(cdt)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def stem2_channel_major(x, mask, w1, a1, b1, w2, a2, b2,
                        interpret=False, chunk=8192):
    """Two fused stem layers, channel-major.

    Args:
      x: (C_in, P) compute-dtype decorated point features.
      mask: (P,) bool point validity.
      w1: (F1, C_in), w2: (F2, F1) compute-dtype kernels (transposed).
      a1, b1: (F1,) f32 folded BN affine; a2, b2: (F2,).
    Returns (F2, P) compute-dtype stem features.
    """
    c_in, p = x.shape
    f1 = w1.shape[0]
    f2 = w2.shape[0]
    chunk = min(chunk, max(128, p))
    p_pad = ((p + chunk - 1) // chunk) * chunk
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p)))
        mask = jnp.pad(mask, (0, p_pad - p))
    m2 = mask[None, :].astype(x.dtype)
    col = lambda v: v.astype(jnp.float32)[:, None]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((f2, p_pad), x.dtype),
        grid=(p_pad // chunk,),
        in_specs=[
            pl.BlockSpec((c_in, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f1, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, f1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f2, chunk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, m2, w1, col(a1), col(b1), w2, col(a2), col(b2))
    return out[:, :p]

"""Fused vote-Swin window-attention core as a Pallas TPU kernel.

The E2E head's WindowAttention (models/swin_vote.py) is T=64-token window
attention with three extras the stock XLA lowering pays HBM round-trips
for: cosine-normalized logits with a per-head temperature, a relative-
position-bias MLP over pairwise cartesian deltas, and an additive shifted-
window region mask. At (576 windows, 4 heads, 64, 64) the logits, the RPE
hidden layer (lane-padded 16 -> 128), and the softmax each cost a full
materialization; this kernel keeps everything (logits, RPE, softmax, AV)
in VMEM — one HBM read of q/k/v + positions, one write of the output.

Forward/inference only: training keeps the XLA path (autodiff), parity is
asserted in tests/test_swin_attn_pallas.py via interpret mode.

Layout note: q/k/v arrive (nW, nh, T, hd). hd = 64 half-fills the 128
lanes (2x DMA pad waste on these small blocks) — cheaper than the lane
relayouts per-head slicing of a (T, nh*hd) layout would trigger.
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
    PARTNER_TPU_PALLAS=1 enables both kernels; PARTNER_TPU_PALLAS_ATTN
    enables/disables this one individually for attribution."""
    flag = os.environ.get("PARTNER_TPU_PALLAS_ATTN",
                          os.environ.get("PARTNER_TPU_PALLAS", "0"))
    return jax.default_backend() != "cpu" and flag == "1"


def _kernel(refs, has_mask):
    if has_mask:
        (q_ref, k_ref, v_ref, pos_ref, mask_ref, w1_ref, b1_ref,
         w2_ref, b2_ref, tau_ref, o_ref) = refs
    else:
        (q_ref, k_ref, v_ref, pos_ref, w1_ref, b1_ref,
         w2_ref, b2_ref, tau_ref, o_ref) = refs
    g, nh, t, hd = q_ref.shape
    f32 = jnp.float32

    for wi in range(g):
        # --- relative position bias: MLP(2 -> 16 -> nh) on pair deltas ---
        pos = pos_ref[wi].astype(f32)                    # (T, 2)
        rel = (pos[:, None, :] - pos[None, :, :]).reshape(t * t, 2)
        hidden = jnp.maximum(
            jnp.dot(rel, w1_ref[:].astype(f32),
                    preferred_element_type=f32) + b1_ref[:].astype(f32), 0.0)
        rpe = (jnp.dot(hidden, w2_ref[:].astype(f32),
                       preferred_element_type=f32)
               + b2_ref[:].astype(f32)).reshape(t, t, nh)
        mask = mask_ref[wi].astype(f32) if has_mask else None

        for h in range(nh):
            q = q_ref[wi, h].astype(f32)                 # (T, hd)
            k = k_ref[wi, h].astype(f32)
            qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
            kn = jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
            logits = jax.lax.dot_general(
                q_ref[wi, h], k_ref[wi, h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)              # (T, T)
            logits = logits / (qn * kn.reshape(1, t))
            logits = logits / tau_ref[0, h]
            logits = logits + rpe[:, :, h]
            if has_mask:
                logits = logits + mask
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[wi, h] = jnp.dot(
                p.astype(v_ref.dtype), v_ref[wi, h],
                preferred_element_type=f32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "g"))
def swin_vote_attention(q, k, v, pos, mask, w1, b1, w2, b2, tau,
                        interpret=False, g=8):
    """Fused cosine window attention with RPE-MLP bias and region mask.

    Args:
      q, k, v: (nW, nh, T, hd) compute dtype (vote embedding already added).
      pos: (nW, T, 2) f32 window cell centers.
      mask: (nW, T, T) f32 additive region mask, or None (unshifted blocks
        — no dense zeros tensor is materialized or streamed).
      w1: (2, H), b1: (H,), w2: (H, nh), b2: (nh,) RPE MLP params (f32).
      tau: (nh,) f32 clamped temperature.
    Returns (nW, nh, T, hd) attention output in q.dtype.
    """
    nw, nh, t, hd = q.shape
    g = min(g, nw)
    pad = (-nw) % g
    has_mask = mask is not None
    if pad:
        zq = jnp.zeros((pad, nh, t, hd), q.dtype)
        q = jnp.concatenate([q, zq], 0)
        k = jnp.concatenate([k, zq], 0)
        v = jnp.concatenate([v, zq], 0)
        pos = jnp.concatenate([pos, jnp.zeros((pad, t, 2), pos.dtype)], 0)
        if has_mask:
            mask = jnp.concatenate(
                [mask, jnp.zeros((pad, t, t), mask.dtype)], 0)
    nwp = q.shape[0]

    row = lambda x: x.astype(jnp.float32)[None, :]
    qkv_spec = pl.BlockSpec((g, nh, t, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec((g, t, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [q, k, v, pos.astype(jnp.float32)]
    if has_mask:
        in_specs.append(pl.BlockSpec((g, t, t), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(mask.astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((2, w1.shape[1]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b1.shape[0]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w2.shape[0], nh), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [w1.astype(jnp.float32), row(b1), w2.astype(jnp.float32),
               row(b2), row(tau)]

    out = pl.pallas_call(
        lambda *refs: _kernel(refs, has_mask),
        out_shape=jax.ShapeDtypeStruct((nwp, nh, t, hd), q.dtype),
        grid=(nwp // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, nh, t, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return out[:nw]

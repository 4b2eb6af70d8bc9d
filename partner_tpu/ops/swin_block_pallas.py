"""Whole-block fused SwinVote transformer block as one Pallas TPU kernel.

VERDICT r4 #7: the E2E head's two SwinVote blocks run at ~18 TF/s vs the
84 TF/s conv floor, and PERF.md's anatomy shows the cost is DIFFUSE glue —
two f32 LayerNorm passes over the 36 MB window stream, window
partition/reverse transposes, f32 residual adds, the (576, 4, 64, 64)
softmax pipeline. Every single-strand replacement measured a loss because
it broke XLA's cross-phase fusion; this kernel is the remaining lever
class: ONE program per window-row sub-stripe spanning

  LN1 -> qkv (+vote-MLP embed) -> cosine window attention (+ precomputed
  RPE/region bias) -> proj -> residual -> LN2 -> MLP -> residual

holding the sub-stripe (9 windows x 64 tokens x 256 ch at flagship
shape) in VMEM with f32 accumulators: one HBM read of x/vote/bias + one
write of the block output, instead of XLA's ~10 passes over the stream.

Mosaic layout rules this is shaped around (first attempt failed
`infer-vector-layout` on a (N, C) -> (nW, T, nh, hd) reshape — splitting
the LANE dim is unsupported):
  * all reshapes/transposes keep the lane (minormost) dim intact;
  * per-head operands come from LEADING-dim indexing of pre-split weight
    tensors ((3, nh, C, hd) qkv etc.), never from lane slicing;
  * the RPE MLP bias is precomputed OUTSIDE the kernel by XLA (the
    decomposed broadcast-subtract form models/swin_vote.py uses, which
    XLA fuses into the tiny second matmul) and streamed in per window as
    a (nh, T, T) additive table with the shifted-window region mask
    folded in — this also removes the lane-padded 2->16->nh matmuls the
    per-strand attention kernel (ops/swin_attn_pallas.py) paid for
    in-kernel.

Constraints (checked by the caller): exact window tiling (H % ws == 0,
W % ws == 0 — flagship 256 x 144 @ ws 8), no pad mask. Shift rolls stay
outside (cheap, and they keep the BlockSpec index maps affine).
Forward/inference only: training keeps the XLA path (autodiff). Parity vs
the XLA block in tests/test_swin_block_pallas.py (interpret mode on CPU);
the on-chip A/B lives in tools/probes/swin_block_ab.py and its verdict in
PERF.md.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def available():
    """Opt-in: PARTNER_TPU_PALLAS_BLOCK=1 on a non-CPU backend."""
    return (jax.default_backend() != "cpu"
            and os.environ.get("PARTNER_TPU_PALLAS_BLOCK", "0") == "1")


def _ln(x, scale, bias, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _window_major(a, ws, nwp, width):
    """(ws, nwp*ws, width) row-major sub-stripe -> (nwp*T, width) window-
    major tokens. Lane dim (width) never changes: sublane split ->
    leading transpose -> merge, all Mosaic-supported."""
    rows = a.shape[0]
    return (a.reshape(rows, nwp, ws, width)
            .transpose(1, 0, 2, 3)
            .reshape(nwp * rows * ws, width))


def _kernel(x_ref, vote_ref, bias_ref,
            ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref,
            vw1_ref, vb1_ref, vw2_ref, vb2_ref, itau_ref,
            projw_ref, projb_ref, ln2s_ref, ln2b_ref,
            f1w_ref, f1b_ref, f2w_ref, f2b_ref,
            o_ref, *, nh, ws, gelu_approx):
    f32 = jnp.float32
    dt = x_ref.dtype
    _, rows, wcols, c = x_ref.shape            # (1, ws, nwp*ws, C)
    nwp = wcols // ws
    t = ws * ws

    x0 = x_ref[0].astype(f32)
    xw = _window_major(x0, ws, nwp, c)         # (N, C) f32, window-major
    y = _ln(xw, ln1s_ref[0].astype(f32), ln1b_ref[0].astype(f32))
    yd = y.astype(dt)

    vt = _window_major(vote_ref[0].astype(f32), ws, nwp, 3)
    vhid = jnp.maximum(
        jnp.dot(vt, vw1_ref[...], preferred_element_type=f32)
        + vb1_ref[0], 0.0)                     # (N, hid) f32

    # per-head q/k/v, heads from leading-dim indexing of pre-split weights
    qs, ks, vs = [], [], []
    for h in range(nh):
        ve = (jnp.dot(vhid, vw2_ref[h], preferred_element_type=f32)
              + vb2_ref[h])                    # (N, hd) f32
        for dst, j in ((qs, 0), (ks, 1), (vs, 2)):
            dst.append(jnp.dot(yd, qkvw_ref[j, h],
                               preferred_element_type=f32)
                       + qkvb_ref[j, h] + ve)

    outs = []
    for wi in range(nwp):
        r0 = wi * t
        acc = jnp.zeros((t, c), f32)
        for h in range(nh):
            qh = qs[h][r0:r0 + t]
            kh = ks[h][r0:r0 + t]
            vv = vs[h][r0:r0 + t]
            # cosine attention, 1/tau folded into the q rows (same math
            # as the XLA path: eps inside the sqrt)
            qn = jnp.sqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-12)
            kn = jnp.sqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-12)
            qhn = (qh * (itau_ref[h] / qn)).astype(dt)
            khn = (kh / kn).astype(dt)
            logits = jax.lax.dot_general(
                qhn, khn, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)    # (T, T)
            logits = logits + bias_ref[0, 0, wi, h]
            logits = logits - jnp.max(logits, -1, keepdims=True)
            p = jnp.exp(logits)
            p = p / jnp.sum(p, -1, keepdims=True)
            po = jnp.dot(p.astype(dt), vv.astype(dt),
                         preferred_element_type=f32)     # (T, hd)
            # proj pre-split per head: concat(heads) @ W == sum_h oh @ W_h
            acc = acc + jnp.dot(po.astype(dt), projw_ref[h],
                                preferred_element_type=f32)
        outs.append(xw[r0:r0 + t] + acc + projb_ref[0])  # residual 1

    x1 = jnp.concatenate(outs, axis=0)          # (N, C) f32
    y2 = _ln(x1, ln2s_ref[0].astype(f32), ln2b_ref[0].astype(f32))
    h1 = (jnp.dot(y2.astype(dt), f1w_ref[...], preferred_element_type=f32)
          + f1b_ref[0])
    h1 = jax.nn.gelu(h1, approximate=gelu_approx)
    h2 = (jnp.dot(h1.astype(dt), f2w_ref[...], preferred_element_type=f32)
          + f2b_ref[0])
    out = x1 + h2                               # residual 2

    # reverse the window-major order back to the (ws, wcols, C) sub-stripe
    out = (out.reshape(nwp, ws, ws, c).transpose(1, 0, 2, 3)
           .reshape(ws, wcols, c))
    o_ref[0] = out.astype(o_ref.dtype)


def _split_cols(nwx, cap=12):
    """Smallest column-split keeping <= cap windows per program (VMEM)."""
    for d in range(1, nwx + 1):
        if nwx % d == 0 and nwx // d <= cap:
            return d
    return nwx


@functools.partial(
    jax.jit,
    static_argnames=("nh", "ws", "gelu_approx", "interpret"))
def swin_vote_block(x, pos, vote, mask, params, nh, ws,
                    gelu_approx=True, interpret=False):
    """One fused SwinVote block (pre-rolled inputs, exact tiling).

    Args:
      x: (B, H, W, C) block input (f32 or bf16).
      pos: (B, H, W, 2), vote: (B, H, W, 3) — pre-rolled like x for
        shifted blocks.
      mask: (nW_total, T, T) f32 additive region mask ordered (wy, wx),
        or None for unshifted blocks.
      params: dict with ln1/ln2 (scale, bias), qkv/proj/mlp_fc1/mlp_fc2
        (kernel, bias), vote_mlp and rpe (Dense_0/Dense_1 kernel+bias),
        tau — the flax WindowAttention/SwinVoteBlock leaves.
    Returns (B, H, W, C) block output in x.dtype (f32 accumulators).
    """
    b, hh, ww, c = x.shape
    assert hh % ws == 0 and ww % ws == 0, "exact tiling required"
    t = ws * ws
    nwy, nwx = hh // ws, ww // ws
    hd = c // nh
    f32 = jnp.float32
    p = params

    # --- RPE bias, computed by XLA (decomposed: layer-1 is linear over
    # the pair difference, so rel@W0 == pos_i@W0 - pos_j@W0; the f32
    # subtract before the cast matters at far range — swin_vote.py:197).
    # The region mask is folded in so the kernel adds ONE table.
    rw0 = jnp.asarray(p["rpe"]["Dense_0"]["kernel"], f32)
    rb0 = jnp.asarray(p["rpe"]["Dense_0"]["bias"], f32)
    rw1 = jnp.asarray(p["rpe"]["Dense_1"]["kernel"], x.dtype)
    rb1 = jnp.asarray(p["rpe"]["Dense_1"]["bias"], x.dtype)
    pw = (pos.astype(f32).reshape(b, nwy, ws, nwx, ws, 2)
          .transpose(0, 1, 3, 2, 4, 5).reshape(b, nwy, nwx, t, 2))
    u = pw @ rw0                                    # (..., T, hid) f32
    h01 = jax.nn.relu(
        (u[..., :, None, :] - u[..., None, :, :] + rb0).astype(x.dtype))
    rpe = (h01 @ rw1 + rb1).astype(f32)             # (..., T, T, nh)
    bias = rpe.transpose(0, 1, 2, 5, 3, 4)          # (b, nwy, nwx, nh, T, T)
    if mask is not None:
        bias = bias + mask.astype(f32).reshape(
            nwy, nwx, t, t)[None, :, :, None]

    itau = 1.0 / jnp.clip(
        jnp.asarray(p["tau"], f32).reshape(nh, 1, 1), min=0.01)

    row = lambda a: jnp.asarray(a, f32)[None, :]
    qkvw = (jnp.asarray(p["qkv"]["kernel"], x.dtype)
            .reshape(c, 3, nh, hd).transpose(1, 2, 0, 3))  # (3, nh, C, hd)
    qkvb = jnp.asarray(p["qkv"]["bias"], f32).reshape(3, nh, 1, hd)
    vhidn = p["vote_mlp"]["Dense_0"]["kernel"].shape[1]
    vw2 = (jnp.asarray(p["vote_mlp"]["Dense_1"]["kernel"], f32)
           .reshape(vhidn, nh, hd).transpose(1, 0, 2))     # (nh, hid, hd)
    vb2 = jnp.asarray(p["vote_mlp"]["Dense_1"]["bias"], f32).reshape(
        nh, 1, hd)
    projw = jnp.asarray(p["proj"]["kernel"], x.dtype).reshape(nh, hd, c)

    weights = [
        row(p["ln1"]["scale"]), row(p["ln1"]["bias"]),
        qkvw, qkvb,
        jnp.asarray(p["vote_mlp"]["Dense_0"]["kernel"], f32),
        row(p["vote_mlp"]["Dense_0"]["bias"]),
        vw2, vb2, itau,
        projw, row(p["proj"]["bias"]),
        row(p["ln2"]["scale"]), row(p["ln2"]["bias"]),
        jnp.asarray(p["mlp_fc1"]["kernel"], x.dtype),
        row(p["mlp_fc1"]["bias"]),
        jnp.asarray(p["mlp_fc2"]["kernel"], x.dtype),
        row(p["mlp_fc2"]["bias"]),
    ]

    nsplit = _split_cols(nwx)
    nwp = nwx // nsplit
    wcols = nwp * ws

    def w_specs():
        return [pl.BlockSpec(w.shape, lambda bi, si, ci, n=w.ndim:
                             (0,) * n, memory_space=pltpu.VMEM)
                for w in weights]

    stripe = lambda ch: pl.BlockSpec(
        (1, ws, wcols, ch), lambda bi, si, ci: (bi, si, ci, 0),
        memory_space=pltpu.VMEM)

    in_specs = [stripe(c), stripe(3),
                pl.BlockSpec((1, 1, nwp, nh, t, t),
                             lambda bi, si, ci: (bi, si, ci, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [x, vote.astype(f32), bias]
    in_specs += w_specs()
    inputs += weights

    kern = functools.partial(
        _kernel, nh=nh, ws=ws, gelu_approx=gelu_approx)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
        grid=(b, nwy, nsplit),
        in_specs=in_specs,
        out_specs=stripe(c),
        interpret=interpret,
    )(*inputs)

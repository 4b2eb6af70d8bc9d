"""Numeric probe: bf16 rounding of pre-normalized cosine-attention operands.

ADVICE r3 (low): models/swin_vote.py computes cosine attention with
PRE-normalized rows — q/(|q| tau) and k/|k| rounded back to bf16 before
the MXU matmul — while the pre-round-3 path divided f32 logits by the
norm outer product. The extra rounding adds a relative ~2^-9 error to
the cosine, which after temperature scaling (tau clipped at 0.01) could
reach a few tenths in logit space. This probe measures, on the real
chip's bf16, the post-softmax attention-weight delta and the top-1
disagreement rate between the two formulations across the tau range,
at flagship window shapes (576 windows x 64 tokens x 8 heads x 32 dim).

Run on chip; results are recorded in PERF.md / VERDICT_RESPONSES.md.
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

NB, NH, T, HD = 576, 8, 64, 32
rng = np.random.RandomState(0)
# realistic post-Dense(+vote-embed) magnitudes
q_np = (rng.randn(NB, NH, T, HD) * 2.0).astype(np.float32)
k_np = (rng.randn(NB, NH, T, HD) * 2.0).astype(np.float32)
q_bf = jnp.asarray(q_np).astype(jnp.bfloat16)
k_bf = jnp.asarray(k_np).astype(jnp.bfloat16)


@jax.jit
def both_paths(q, k, tau):
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(qf * qf, -1, keepdims=True) + 1e-12)
    kn = jnp.sqrt(jnp.sum(kf * kf, -1, keepdims=True) + 1e-12)
    # current path: pre-normalized operands rounded to bf16
    qh = (qf / (qn * tau)).astype(q.dtype)
    kh = (kf / kn).astype(k.dtype)
    a_new = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                       preferred_element_type=jnp.float32)
    # pre-round-3 path: raw bf16 matmul, f32 logits divided by norms
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32)
    a_old = s / (qn * jnp.swapaxes(kn, -1, -2) * tau)
    w_new = jax.nn.softmax(a_new, -1)
    w_old = jax.nn.softmax(a_old, -1)
    top_flip = jnp.mean((jnp.argmax(w_new, -1)
                         != jnp.argmax(w_old, -1)).astype(jnp.float32))
    return (jnp.max(jnp.abs(a_new - a_old)),
            jnp.max(jnp.abs(w_new - w_old)),
            jnp.mean(jnp.abs(w_new - w_old)), top_flip)


out = {}
for tau in (1.0, 0.25, 0.1, 0.05, 0.01):
    dl, dwmax, dwmean, flip = [float(x) for x in
                               both_paths(q_bf, k_bf, tau)]
    out[f"tau={tau}"] = {"logit_maxdiff": round(dl, 4),
                         "weight_maxdiff": round(dwmax, 4),
                         "weight_meandiff": round(dwmean, 6),
                         "top1_flip_rate": round(flip, 5)}
    print(f"tau={tau}: dlogit={dl:.4f} dw_max={dwmax:.4f} "
          f"dw_mean={dwmean:.6f} top1_flip={flip:.5f}", flush=True)
print(json.dumps(out))

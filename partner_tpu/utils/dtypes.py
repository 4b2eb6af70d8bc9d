"""Compute-dtype resolution.

bf16 compute is a TPU optimization (MXU-native, halves HBM traffic). The
XLA:CPU thunk runtime in this environment cannot execute bf16 dots at all
(``Unsupported element type for DotThunk::Execute: BF16 x BF16 = F32``),
and on CPU bf16 buys nothing — so every module that takes a
``compute_dtype`` resolves it through here: bf16 downgrades to f32 when
the active backend is CPU, and passes through unchanged on accelerators.
"""

import jax
import jax.numpy as jnp


def resolve_compute_dtype(dt):
    """jnp.dtype of ``dt``, with bf16 -> f32 on the CPU backend."""
    dt = jnp.dtype(dt)
    if dt == jnp.bfloat16 and jax.default_backend() == "cpu":
        return jnp.dtype(jnp.float32)
    return dt

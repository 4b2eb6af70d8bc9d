"""Azimuth-ring halo exchange for sector-sharded BEV maps.

The reference streams sectors sequentially, caching each conv's trailing
rows (necks/rpn_context.py ConvContext/ConvBDCP) and using circular padding
for full sweeps. On a TPU mesh the natural equivalent (SURVEY.md 5.7) is:
sectors live on the ``azimuth`` mesh axis under shard_map, and the cached /
circular boundary rows become ``jax.lax.ppermute`` halo exchanges around the
ICI ring — a literal ring-friendly pattern.
"""

import jax
import jax.numpy as jnp
from jax import lax


def ring_halo(x, pad, axis_name="azimuth", axis=1):
    """Cyclic bidirectional halo: prepend the previous shard's trailing rows
    and append the next shard's leading rows along `axis`.

    Inside shard_map over `axis_name`; x (B, az_shard, r, C) by default.
    With a single shard this degenerates to circular padding.
    """
    n = lax.psum(1, axis_name)
    lead = lax.slice_in_dim(x, 0, pad, axis=axis)
    trail = lax.slice_in_dim(x, x.shape[axis] - pad, x.shape[axis], axis=axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = lax.ppermute(trail, axis_name, fwd)   # prev shard's trailing
    from_next = lax.ppermute(lead, axis_name, bwd)    # next shard's leading
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def trailing_halo(x, pad, axis_name="azimuth", axis=1):
    """One-directional (trailing-edge) halo: previous shard's trailing rows
    prepended; the leading edge of shard 0 gets zeros (matches ConvContext's
    first-sector zero padding, rpn_context.py:35-42)."""
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    trail = lax.slice_in_dim(x, x.shape[axis] - pad, x.shape[axis], axis=axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    from_prev = lax.ppermute(trail, axis_name, fwd)
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    pad_spec = [(0, 0)] * x.ndim
    pad_spec[axis] = (0, pad)
    return jnp.concatenate([from_prev, jnp.pad(x, pad_spec)], axis=axis)

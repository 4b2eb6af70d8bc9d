"""FLOPs counting + MFU, via XLA's compiled cost analysis.

Replaces the reference's hook-based torch counter
(/root/reference/det3d/utils/flops_counter.py) with the compiler's own
numbers: `jax.jit(fn).lower(...).compile().cost_analysis()` reports the
exact optimized-HLO flops and bytes, which covers every op (convs,
attention, NMS) without per-module instrumentation.
"""

# bf16 peak matmul throughput per chip, FLOP/s
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e
}
DEFAULT_PEAK = 197e12


def cost_analysis(fn, *args, **kwargs):
    """Compile fn and return XLA's cost dict (keys: flops, bytes accessed,
    optimal_seconds, ...)."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    return lowered.compile().cost_analysis()


def flops_of(fn, *args, **kwargs):
    c = cost_analysis(fn, *args, **kwargs)
    return float(c.get("flops", 0.0))


def device_peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_FLOPS.items():
        if kind.startswith(name) or name.startswith(kind):
            return peak
    return DEFAULT_PEAK


def mfu(total_flops, seconds, peak=None):
    """Model flops utilization: achieved / peak."""
    peak = peak or device_peak_flops()
    if seconds <= 0:
        return 0.0
    return total_flops / seconds / peak

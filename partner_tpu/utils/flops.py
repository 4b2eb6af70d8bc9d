"""FLOPs counting + MFU, via XLA's compiled cost analysis.

Replaces the reference's hook-based torch counter
(/root/reference/det3d/utils/flops_counter.py) with the compiler's own
numbers: `jax.jit(fn).lower(...).compile().cost_analysis()` reports the
exact optimized-HLO flops and bytes, which covers every op (convs,
attention, NMS) without per-module instrumentation.

`per_module_flops` adds the reference counter's per-module attribution
(flops_counter.py:60-90 prints a per-layer table): every jaxpr equation
carries the flax module path in its `source_info.name_stack`, so
dot_general/conv FLOPs can be attributed per module scope mechanically —
no hooks, no model surgery. tools/flops_report.py prints the table for
any config; PERF.md's anatomy GFLOP columns come from this.
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


def _prod(xs):
    out = 1
    for v in xs:
        out *= int(v)
    return out


def _eqn_flops(eqn):
    """Matmul-class FLOPs of one jaxpr equation (0 for elementwise ops —
    the MXU work is what the anatomy tables and MFU care about)."""
    prim = eqn.primitive.name
    if prim == "dot_general":
        (lc, _rc), (lb, _rb) = eqn.params["dimension_numbers"]
        lhs = eqn.invars[0].aval.shape
        k = _prod(lhs[i] for i in lc)
        b = _prod(lhs[i] for i in lb)
        m = _prod(lhs[i] for i in range(len(lhs)) if i not in lc + lb)
        out = eqn.outvars[0].aval.shape
        n = _prod(out) // max(b * m, 1)
        return 2.0 * b * m * n * k
    if prim == "conv_general_dilated":
        out = _prod(eqn.outvars[0].aval.shape)
        rhs = eqn.invars[1].aval.shape
        dn = eqn.params["dimension_numbers"]
        in_ch = rhs[dn.rhs_spec[1]]           # per feature group
        k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
        return 2.0 * out * in_ch * k_spatial
    return 0.0


def _stack_parts(eqn):
    stack = str(eqn.source_info.name_stack)
    return tuple(s for s in stack.split("/") if s and "(" not in s)


def _walk_jaxpr(jaxpr, acc, depth, mult=1.0, prefix=()):
    for eqn in jaxpr.eqns:
        sub = None
        submult = mult
        # sub-jaxpr eqns carry stacks RELATIVE to the enclosing eqn's
        # scope (scan/while bodies re-trace) — thread it as a prefix
        subprefix = prefix + _stack_parts(eqn)
        p = eqn.params
        if "jaxpr" in p:                       # pjit / scan / remat / ...
            sub = p["jaxpr"]
            if eqn.primitive.name == "scan":
                submult = mult * p.get("length", 1)
        elif "call_jaxpr" in p:                # custom_jvp/vjp, core.call
            sub = p["call_jaxpr"]
        elif "branches" in p:                  # cond: charge the max branch
            best, chosen = -1.0, None
            for br in p["branches"]:
                trial = {}
                _walk_jaxpr(br.jaxpr if hasattr(br, "jaxpr") else br,
                            trial, depth, mult, subprefix)
                tot = sum(trial.values())
                if tot > best:
                    best, chosen = tot, trial
            for key, v in (chosen or {}).items():
                acc[key] = acc.get(key, 0.0) + v
            continue
        elif eqn.primitive.name == "while":
            sub = p.get("body_jaxpr")          # counted once (bound
            # unknown statically; greedy-NMS etc. — matches how the
            # whole-program XLA cost analysis treats it)
        if sub is not None:
            _walk_jaxpr(sub.jaxpr if hasattr(sub, "jaxpr") else sub,
                        acc, depth, submult, subprefix)
            continue
        fl = _eqn_flops(eqn)
        if not fl:
            continue
        parts = prefix + _stack_parts(eqn)
        key = "/".join(parts[:depth]) if parts else "<top>"
        acc[key] = acc.get(key, 0.0) + fl * mult


def per_module_flops(fn, *args, depth=3, **kwargs):
    """Per-module matmul/conv FLOPs table from the traced jaxpr.

    Returns {module_path: flops} where module_path is the first `depth`
    components of the flax scope (e.g. "VoxelNetModule/backbone/trunk").
    Complements `cost_analysis` (whole-program, optimized-HLO): this
    table is pre-optimization but attributable; totals agree within the
    fusion/simplification delta.
    """
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = {}
    _walk_jaxpr(jaxpr.jaxpr, acc, depth)
    return dict(sorted(acc.items(), key=lambda kv: -kv[1]))

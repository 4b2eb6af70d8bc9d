"""Optimizer + LR schedules: one-cycle Adam with decoupled weight decay.

Replaces the reference fastai stack (/root/reference/det3d/solver/
learning_schedules_fastai.py:77-126 OneCycle, fastai_optim.py:118-268
OptimWrapper true-wd) with an optax chain:

  clip_by_global_norm(35) -> scale_by_adam(b1=momentum(t)) ->
  add_decayed_weights(wd, mask=ndim>1) -> scale_by_learning_rate(lr(t))

The one-cycle curves are cosine-annealed two-phase ramps:
  lr:  lr_max/div -> lr_max (pct_start) -> lr_max/1e4
  mom: m0 -> m1 (pct_start) -> m0
"""

import jax.numpy as jnp
import numpy as np
import optax


def _annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1  # 2 -> 0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr(lr_max, total_steps, div_factor=10.0, pct_start=0.4,
                 final_div=1e4):
    """Reference OneCycle semantics (learning_schedules_fastai.py:77-96):
    integer phase split int(pct_start * total), cosine low -> lr_max over
    [0, split) then lr_max -> LOW/final_div (the reference's low_lr/1e4,
    :88 — i.e. lr_max / (div_factor * final_div)) over [split, total]."""
    low = lr_max / div_factor
    split = int(pct_start * total_steps)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = _annealing_cos(low, lr_max, step / jnp.maximum(split, 1))
        down = _annealing_cos(
            lr_max, low / final_div,
            (step - split) / jnp.maximum(total_steps - split, 1),
        )
        return jnp.where(step < split, up, down)

    return sched


def one_cycle_momentum(moms, total_steps, pct_start=0.4):
    m0, m1 = moms
    split = int(pct_start * total_steps)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        down = _annealing_cos(m0, m1, step / jnp.maximum(split, 1))
        up = _annealing_cos(
            m1, m0, (step - split) / jnp.maximum(total_steps - split, 1)
        )
        return jnp.where(step < split, down, up)

    return sched


def build_one_cycle_optimizer(lr_max, total_steps, wd=0.01, moms=(0.95, 0.85),
                              div_factor=10.0, pct_start=0.4, grad_clip=35.0,
                              amsgrad=False, wd_exclude_vectors=False):
    """optax GradientTransformation implementing the reference recipe
    (torchie/apis/train.py:198-215 + optimizer_config grad_clip).

    True weight decay matches the reference's fastai OptimWrapper
    (fastai_optim.py:155-171): p *= (1 - wd*lr) before the Adam step —
    algebraically p -= lr*(adam(g) + wd*p), our add_decayed_weights
    chain. Both call sites pass bn_wd=True (train.py:212, builder.py:103),
    so the reference decays EVERY parameter including biases and norm
    affines; ``wd_exclude_vectors=True`` opts into the modern
    exclude-ndim<=1 mask instead (a documented deviation)."""
    lr = one_cycle_lr(lr_max, total_steps, div_factor, pct_start)
    mom = one_cycle_momentum(moms, total_steps, pct_start)

    def wd_mask(params):
        import jax

        return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, params)

    mask = wd_mask if wd_exclude_vectors else None

    @optax.inject_hyperparams
    def inner(learning_rate, b1):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.add_decayed_weights(wd, mask=mask),
            optax.scale_by_learning_rate(learning_rate),
        )

    return inner(learning_rate=lr, b1=mom)


# ---------------------------------------------------------------------------
# The reference lr_updater family (torchie/trainer/hooks/lr_updater.py:
# 10-165): fixed / step / exp / poly / inv / cosine, each with optional
# constant / linear / exp warmup. All are jittable step-indexed schedules;
# ``by_epoch`` semantics use floor(step / steps_per_epoch) as the progress
# like the reference's epoch-granular updates.
# ---------------------------------------------------------------------------


def with_warmup(sched, warmup, warmup_iters, warmup_ratio=0.1):
    """Wrap a schedule with the reference warmup shapes
    (lr_updater.py:42-53): constant / linear / exp ramps of the regular
    lr over the first ``warmup_iters`` steps."""
    if not warmup or warmup_iters <= 0:
        return sched

    def wrapped(step):
        step = jnp.asarray(step, jnp.float32)
        regular = sched(step)
        frac = jnp.clip(step / warmup_iters, 0.0, 1.0)
        if warmup == "constant":
            w = regular * warmup_ratio
        elif warmup == "linear":
            w = regular * (1 - (1 - frac) * (1 - warmup_ratio))
        elif warmup == "exp":
            w = regular * warmup_ratio ** (1 - frac)
        else:
            raise ValueError(f"unknown warmup {warmup!r}")
        return jnp.where(step < warmup_iters, w, regular)

    return wrapped


def build_lr_schedule(lr_config, total_steps, steps_per_epoch=None,
                      base_lr=None):
    """lr_config dict (reference lr_config / lr_updater kwargs) -> a
    jittable step -> lr schedule.

    Supported types: one_cycle (solver/learning_schedules_fastai.py:77),
    fixed, step, exp, poly, inv, cosine (hooks/lr_updater.py:85-168), with
    warmup/warmup_iters/warmup_ratio applied like the reference hook."""
    cfg = dict(lr_config)
    kind = cfg.get("type", "one_cycle")
    if kind == "one_cycle":
        return one_cycle_lr(cfg.get("lr_max", base_lr or 3e-3), total_steps,
                            cfg.get("div_factor", 10.0),
                            cfg.get("pct_start", 0.4))

    lr0 = base_lr if base_lr is not None else cfg.get("lr", 1e-3)
    by_epoch = cfg.get("by_epoch", True)
    spe = max(int(steps_per_epoch or 1), 1)
    denom = spe if by_epoch else 1
    max_progress = total_steps / denom

    if kind == "fixed":
        sched = lambda step: jnp.full((), lr0, jnp.float32)
    elif kind == "step":
        steps = cfg["step"]
        gamma = cfg.get("gamma", 0.1)
        if isinstance(steps, int):
            sched = lambda step: lr0 * gamma ** jnp.floor(
                jnp.floor(step / denom) / steps)
        else:
            bounds = jnp.asarray(steps, jnp.float32)

            def sched(step):
                prog = jnp.floor(jnp.asarray(step, jnp.float32) / denom)
                exp = jnp.sum(prog >= bounds)
                return lr0 * gamma ** exp
    elif kind == "exp":
        gamma = cfg["gamma"]
        sched = lambda step: lr0 * gamma ** jnp.floor(step / denom)
    elif kind == "poly":
        power = cfg.get("power", 1.0)
        min_lr = cfg.get("min_lr", 0.0)

        def sched(step):
            prog = jnp.floor(jnp.asarray(step, jnp.float32) / denom)
            coeff = (1 - prog / max_progress) ** power
            return (lr0 - min_lr) * coeff + min_lr
    elif kind == "inv":
        gamma = cfg["gamma"]
        power = cfg.get("power", 1.0)
        sched = lambda step: lr0 * (
            1 + gamma * jnp.floor(step / denom)) ** (-power)
    elif kind == "cosine":
        target = cfg.get("target_lr", 0.0)

        def sched(step):
            prog = jnp.floor(jnp.asarray(step, jnp.float32) / denom)
            return target + 0.5 * (lr0 - target) * (
                1 + jnp.cos(jnp.pi * prog / max_progress))
    else:
        raise ValueError(f"unknown lr schedule type {kind!r}")

    return with_warmup(sched, cfg.get("warmup"), cfg.get("warmup_iters", 0),
                       cfg.get("warmup_ratio", 0.1))


def build_optimizer(optimizer_cfg, lr_sched, grad_clip=35.0,
                    no_wd_patterns=()):
    """Config-driven optimizer (the reference's param-wise build_optimizer,
    torchie/apis/train.py:218-290): adam / amsgrad / sgd with decoupled
    weight decay, decay masked off biases/norms (ndim <= 1) and any param
    whose path matches a ``no_wd_patterns`` substring (the reference's
    bias_decay_mult / norm_decay_mult = 0 convention)."""
    import jax

    cfg = dict(optimizer_cfg)
    kind = cfg.get("type", "adam").lower()
    wd = cfg.get("wd", cfg.get("weight_decay", 0.0))

    def wd_mask(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def decay(path, p):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if any(pat in name for pat in no_wd_patterns):
                return False
            return jnp.ndim(p) > 1

        tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [decay(path, p) for path, p in flat])
        return tree

    if kind in ("adam", "adamw", "amsgrad"):
        scale = optax.scale_by_amsgrad() if (
            kind == "amsgrad" or cfg.get("amsgrad")) else \
            optax.scale_by_adam(b1=cfg.get("betas", (0.9, 0.99))[0],
                                b2=cfg.get("betas", (0.9, 0.99))[1])
    elif kind == "sgd":
        scale = optax.trace(decay=cfg.get("momentum", 0.9), nesterov=False)
    else:
        raise ValueError(f"unknown optimizer type {kind!r}")

    @optax.inject_hyperparams
    def inner(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            scale,
            optax.add_decayed_weights(wd, mask=wd_mask) if wd
            else optax.identity(),
            optax.scale_by_learning_rate(learning_rate),
        )

    return inner(learning_rate=lr_sched)

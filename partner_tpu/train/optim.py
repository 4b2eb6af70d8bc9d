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
    low = lr_max / div_factor
    split = pct_start * total_steps

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = _annealing_cos(low, lr_max, step / jnp.maximum(split, 1))
        down = _annealing_cos(
            lr_max, lr_max / final_div,
            (step - split) / jnp.maximum(total_steps - split, 1),
        )
        return jnp.where(step < split, up, down)

    return sched


def one_cycle_momentum(moms, total_steps, pct_start=0.4):
    m0, m1 = moms
    split = pct_start * total_steps

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
                              amsgrad=False):
    """optax GradientTransformation implementing the reference recipe
    (torchie/apis/train.py:198-215 + optimizer_config grad_clip)."""
    lr = one_cycle_lr(lr_max, total_steps, div_factor, pct_start)
    mom = one_cycle_momentum(moms, total_steps, pct_start)

    def wd_mask(params):
        import jax

        return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, params)

    @optax.inject_hyperparams
    def inner(learning_rate, b1):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.add_decayed_weights(wd, mask=wd_mask),
            optax.scale_by_learning_rate(learning_rate),
        )

    return inner(learning_rate=lr, b1=mom)

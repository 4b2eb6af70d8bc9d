"""Train state + jitted step builders (the Trainer hot path).

Replaces the reference's batch_processor + OptimizerHook sequence
(torchie/trainer/trainer.py:414-501, hooks/optimizer.py:6-21) with a single
pjit-compiled function: forward -> loss -> grad -> clip -> adam -> apply,
with gradient psum inserted by XLA from the batch sharding.
"""

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx):
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(detector, tx):
    """Returns step(state, example, rng) -> (state, metrics)."""

    def step(state, example, rng):
        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            ld, updates = detector.loss(variables, example, rng=rng,
                                        train=True)
            return ld["loss"], (ld, updates.get("batch_stats", {}))

        (loss, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in ld.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs if new_bs else state.batch_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    return step


def make_eval_step(detector):
    def step(state, example):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return detector.predict(variables, example)

    return step

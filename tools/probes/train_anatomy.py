"""In-process on-chip anatomy of the flagship train step (~89 ms).

Programs (each jitted whole):
  loss_only   forward + GT-processor targets + SetCriterion (incl. the
              on-device auction matcher) — no grad
  grad_only   value_and_grad of the same loss (fwd + bwd)
  full_step   grad + one-cycle Adam update (the bench/train-CLI step)

Marginals: criterion+matcher ≈ loss_only - inference_fwd (~20 ms),
backward ≈ grad_only - loss_only, optimizer ≈ full_step - grad_only.
Writes one JSON line.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from partner_tpu import testing
from partner_tpu.models import build_detector
from partner_tpu.train.config import Config
from partner_tpu.train.optim import build_one_cycle_optimizer
from partner_tpu.train.train_state import create_train_state, make_train_step

cfg = Config.fromfile("/root/repo/configs/waymo/waymo_partner_36epoch.py")
det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
grid = tuple(cfg.grid_size)
pc_range = cfg.voxel_generator["range"]
vs = [(pc_range[3 + i] - pc_range[i]) / grid[i] for i in range(3)]
rng = np.random.RandomState(7)
example = testing.make_flagship_example(
    rng, grid=grid, pc_range=pc_range, voxel_size=vs, b=1,
    n_points=150000, cap=180000, point_dim=7, max_objs=64,
)
variables = det.init(jax.random.PRNGKey(0),
                     {"points": example["points"][:, :2048],
                      "points_mask": example["points_mask"][:, :2048]})
tx = build_one_cycle_optimizer(lr_max=3e-3, total_steps=1000)
state = create_train_state(variables, tx)
step = make_train_step(det, tx)
key = jax.random.PRNGKey(1)


def loss_fn(params, bs):
    ld, _ = det.loss({"params": params, "batch_stats": bs}, example,
                     rng=key, train=True)
    return ld["loss"]


@jax.jit
def loss_only(params, bs):
    return loss_fn(params, bs)


@jax.jit
def grad_only(params, bs):
    return jax.value_and_grad(loss_fn)(params, bs)


# no donation here: loss_only/grad_only close over state.params, which a
# donating full step would invalidate; donation is measured neutral anyway
# (tools/probes/train_donate_ab.py: 88.88 vs 88.75 ms)
jstep = jax.jit(step)

progs = {}
print("compiling...", flush=True)
out = loss_only(state.params, state.batch_stats)
float(out)
progs["loss_only"] = lambda: loss_only(state.params, state.batch_stats)
val, g = grad_only(state.params, state.batch_stats)
float(val)
progs["grad_only"] = lambda: grad_only(state.params, state.batch_stats)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def window(fn, n=10):
    for _ in range(3):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


times = {k: [] for k in ("loss_only", "grad_only", "full_step")}
st = jstep(state, example, key)[0]  # compile + warm state
for r in range(3):
    times["loss_only"].append(window(progs["loss_only"]))
    times["grad_only"].append(window(progs["grad_only"]))

    def full():
        global st
        st, m = jstep(st, example, key)
        return m["loss"]
    times["full_step"].append(window(full))
    print(f"round {r}: " + " ".join(
        f"{k}={v[-1]:.1f}" for k, v in times.items()), flush=True)

best = {k: min(v) for k, v in times.items()}
res = {
    "ms": {k: round(v, 2) for k, v in best.items()},
    "marginal_ms": {
        "backward": round(best["grad_only"] - best["loss_only"], 2),
        "optimizer": round(best["full_step"] - best["grad_only"], 2),
        "criterion_vs_infer_fwd_20ms": round(best["loss_only"] - 20.0, 2),
    },
}
print(json.dumps(res), flush=True)

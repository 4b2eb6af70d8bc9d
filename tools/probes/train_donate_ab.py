"""In-process on-chip A/B: train step with vs without buffer donation.

tools/train.py's production loop donates the TrainState
(jax.jit(step, donate_argnums=(0,)) — train.py:210) so params/opt-state
update in place; bench.py's train_step harness compiled WITHOUT donation,
so every step allocated fresh param+adam buffers and copied the old ones.
This probe times both compilations of the SAME step function on the same
flagship example, interleaved windows, and prints one JSON line.
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
step = make_train_step(det, tx)

param_mb = sum(np.prod(x.shape) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(variables["params"])) / 1e6

jstep_plain = jax.jit(step)
jstep_donate = jax.jit(step, donate_argnums=(0,))

print(f"params {param_mb:.1f} MB; compiling...", flush=True)
s0 = create_train_state(variables, tx)
s_p, m = jstep_plain(s0, example, jax.random.PRNGKey(1))
float(m["loss"])
s_d, m = jstep_donate(create_train_state(variables, tx), example,
                      jax.random.PRNGKey(1))
float(m["loss"])


def window(jstep, state):
    for _ in range(4):
        state, metrics = jstep(state, example, jax.random.PRNGKey(2))
    float(metrics["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, metrics = jstep(state, example, jax.random.PRNGKey(3))
    float(metrics["loss"])
    return (time.perf_counter() - t0) / n * 1e3, state


plain, donate = [], []
for r in range(3):
    ms, s_p = window(jstep_plain, s_p)
    plain.append(ms)
    ms, s_d = window(jstep_donate, s_d)
    donate.append(ms)
    print(f"round {r}: plain {plain[-1]:.1f} ms donate {donate[-1]:.1f} ms",
          flush=True)

res = {
    "plain_ms": round(min(plain), 2),
    "donate_ms": round(min(donate), 2),
    "plain_windows": [round(v, 1) for v in plain],
    "donate_windows": [round(v, 1) for v in donate],
    "params_mb": round(param_mb, 1),
    "speedup_pct": round(100 * (min(plain) / min(donate) - 1), 2),
}
print(json.dumps(res), flush=True)

"""Per-phase BACKWARD attribution + train-throughput levers, on chip.

Round-4 measured the flagship train step at ~91 ms with backward 64.9 ms
= 3.2x the 20 ms forward, where ~2x is the conv dgrad/wgrad expectation —
this probe finds where the extra ~20 ms lives and measures the levers
(VERDICT r4 next #2).

Attribution method: VJP-ablation. grad programs of the same loss with
jax.lax.stop_gradient inserted at phase boundaries (module sg_after
knobs, models/detectors.py / models/backbone_dense.py). Differencing
consecutive programs isolates each phase's backward marginal:

  bwd(loss+head) = grad[sg=neck]     - loss_only
  bwd(neck)      = grad[sg=set]      - grad[sg=neck]
  bwd(set)       = grad[sg=backbone] - grad[sg=set]
  bwd(trunk)     = grad[sg=scatter]  - grad[sg=backbone]
  bwd(scatter+stem) = grad[full]     - grad[sg=scatter]

(the scatter VJP and the stem backward can't be split by stop_gradient —
grads of stem params flow THROUGH the scatter VJP — so they're reported
together, plus a standalone scatter-max VJP micro-measurement.)

Levers (full train step, A/B within this process):
  remat_swin  jax.checkpoint on the two SwinVote blocks
  remat_set   jax.checkpoint on the two SetBlocks
  remat_both
  bf16_train  set+head compute_dtype bfloat16 in training

Writes one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from partner_tpu import testing
from partner_tpu.models import build_detector
from partner_tpu.models.detectors import E2EDetector
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
key = jax.random.PRNGKey(1)


def variant(sg=(), backbone_sg=(), remat_swin=False, remat_set=False,
            bf16=False):
    """Clone the flagship detector with probe knobs; same params apply."""
    m = det.module
    head_cfg = dict(m.head_cfg)
    set_cfg = dict(m.set_cfg or {})
    backbone_cfg = dict(m.backbone_cfg)
    if remat_swin:
        head_cfg["remat"] = True
    if remat_set:
        set_cfg["set_remat"] = True
    if bf16:
        head_cfg["compute_dtype"] = "bfloat16"
        set_cfg["set_compute_dtype"] = "bfloat16"
    if backbone_sg:
        backbone_cfg["sg_after"] = tuple(backbone_sg)
    m2 = m.clone(sg_after=tuple(sg), head_cfg=head_cfg, set_cfg=set_cfg,
                 backbone_cfg=backbone_cfg)
    d2 = E2EDetector(m2, det.criterion, det.test_cfg)
    d2.input_kind = det.input_kind
    return d2


def make_grad(d):
    def loss_fn(params, bs):
        ld, _ = d.loss({"params": params, "batch_stats": bs}, example,
                       rng=key, train=True)
        return ld["loss"]

    return jax.jit(jax.value_and_grad(loss_fn))


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def window(fn, n=10, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        for _ in range(3):
            out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


res = {"ms": {}}

# ---- attribution ----------------------------------------------------
def loss_only_fn(params, bs):
    ld, _ = det.loss({"params": params, "batch_stats": bs}, example,
                     rng=key, train=True)
    return ld["loss"]


jloss = jax.jit(loss_only_fn)
print("compiling loss_only...", flush=True)
float(jloss(variables["params"], variables.get("batch_stats", {})))
res["ms"]["loss_only"] = window(
    lambda: jloss(variables["params"], variables.get("batch_stats", {})))
print(f"loss_only {res['ms']['loss_only']:.1f} ms", flush=True)

grads = {
    "grad_full": make_grad(det),
    "grad_sg_neck": make_grad(variant(sg=("neck",))),
    "grad_sg_set": make_grad(variant(sg=("set",))),
    "grad_sg_backbone": make_grad(variant(sg=("backbone",))),
    "grad_sg_scatter": make_grad(variant(backbone_sg=("scatter",))),
}
bs = variables.get("batch_stats", {})
for name, g in grads.items():
    print(f"compiling {name}...", flush=True)
    v, _ = g(variables["params"], bs)
    float(v)
    res["ms"][name] = window(lambda g=g: g(variables["params"], bs))
    print(f"{name} {res['ms'][name]:.1f} ms", flush=True)

m = res["ms"]
res["bwd_marginal_ms"] = {
    "loss+head": round(m["grad_sg_neck"] - m["loss_only"], 2),
    "neck": round(m["grad_sg_set"] - m["grad_sg_neck"], 2),
    "set": round(m["grad_sg_backbone"] - m["grad_sg_set"], 2),
    "trunk": round(m["grad_sg_scatter"] - m["grad_sg_backbone"], 2),
    "scatter+stem": round(m["grad_full"] - m["grad_sg_scatter"], 2),
    "total_bwd": round(m["grad_full"] - m["loss_only"], 2),
}
print(json.dumps(res["bwd_marginal_ms"]), flush=True)

# ---- standalone scatter-max VJP micro -------------------------------
from partner_tpu.models.backbone_dense import scatter_canvas

n_pts = 216000
feats = jnp.asarray(rng.rand(1, n_pts, 64).astype(np.float32))
coords = jnp.asarray(
    np.stack([rng.randint(0, 5, n_pts), rng.randint(0, 512, n_pts),
              rng.randint(0, 288, n_pts)], -1)[None].astype(np.int32))
pmask = jnp.ones((1, n_pts), bool)


def scat(f):
    canvas, _ = scatter_canvas(f, coords, pmask, (5, 512, 288), 1, 1,
                               dtype=jnp.bfloat16, fold2d=True)
    return canvas.astype(jnp.float32).sum()


jfwd = jax.jit(scat)
jvjp = jax.jit(jax.grad(scat))
float(jfwd(feats))
sync(jvjp(feats))
res["ms"]["scatter_fwd_standalone"] = window(lambda: jfwd(feats))
res["ms"]["scatter_vjp_standalone"] = window(lambda: jvjp(feats))
print(f"scatter fwd {res['ms']['scatter_fwd_standalone']:.2f} ms, "
      f"fwd+vjp {res['ms']['scatter_vjp_standalone']:.2f} ms", flush=True)

# ---- levers: full train step A/B ------------------------------------
tx = build_one_cycle_optimizer(lr_max=3e-3, total_steps=1000)


def step_ms(d, label):
    state = create_train_state(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}, tx)
    jstep = jax.jit(make_train_step(d, tx))
    print(f"compiling step[{label}]...", flush=True)
    st, mt = jstep(state, example, key)
    float(mt["loss"])
    holder = {"st": st}

    def run():
        holder["st"], mt = jstep(holder["st"], example, key)
        return mt["loss"]

    ms = window(run)
    print(f"step[{label}] {ms:.1f} ms", flush=True)
    return ms


res["step_ms"] = {}
res["step_ms"]["baseline"] = step_ms(det, "baseline")
res["step_ms"]["remat_swin"] = step_ms(variant(remat_swin=True),
                                       "remat_swin")
res["step_ms"]["remat_set"] = step_ms(variant(remat_set=True), "remat_set")
res["step_ms"]["remat_both"] = step_ms(
    variant(remat_swin=True, remat_set=True), "remat_both")
if os.environ.get("PROBE_BF16", "1") != "0":
    res["step_ms"]["bf16_train"] = step_ms(variant(bf16=True), "bf16_train")
    res["step_ms"]["bf16_remat_both"] = step_ms(
        variant(remat_swin=True, remat_set=True, bf16=True),
        "bf16_remat_both")

print(json.dumps(res), flush=True)

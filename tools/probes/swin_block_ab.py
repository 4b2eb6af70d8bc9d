"""In-process on-chip A/B: whole-block fused SwinVote Pallas kernel vs XLA.

VERDICT r4 #7: every single-strand replacement inside the SwinVote blocks
(Pallas window attention, static-RPE cache, fused head convs) measured a
LOSS because it broke XLA's cross-phase fusion. The remaining lever class
is ONE Pallas program per window-row stripe spanning the whole block
(LN1 -> qkv+vote-embed -> cosine attention + RPE bias -> proj -> residual
-> LN2 -> MLP -> residual), holding the stripe in VMEM with f32
accumulators — one HBM read + one write instead of XLA's ~10 passes over
the 36 MB window stream (ops/swin_block_pallas.py).

Protocol identical to static_rpe_ab.py: both arms traced in one process
(the env gate PARTNER_TPU_PALLAS_BLOCK is read at Python trace time),
windows interleaved A/B/A/B, unbounded dispatch, best-of-4 windows, plus
an on-chip decode parity check and a standalone two-block micro timing at
exact flagship shapes ((1, 256, 144, 256), ws=8, nh=4).

Writes one JSON line:
  {"xla_fps", "fused_fps", "speedup_pct", "decode_max_abs_diff",
   "block_xla_ms", "block_fused_ms", ...}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from partner_tpu.models import build_detector
from partner_tpu.train.config import Config

cfg = Config.fromfile("/root/repo/configs/waymo/waymo_partner_36epoch.py")
det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
pc_range = cfg.voxel_generator["range"]
n_points = 180000

rng = np.random.RandomState(0)
c = det.module.reader_cfg.get("num_input_features", 7)
rho = np.exp(rng.uniform(np.log(pc_range[0] + 0.2),
                         np.log(pc_range[3] - 0.2), n_points))
z = pc_range[2] + np.abs(rng.randn(n_points)) * 0.18 * (
    pc_range[5] - pc_range[2])
z = np.clip(z, pc_range[2], pc_range[5])
phi = rng.uniform(pc_range[1], pc_range[4], n_points)
cols = [rho, phi, z, rho * np.cos(phi), rho * np.sin(phi)]
while len(cols) < c:
    cols.append(rng.rand(n_points))
pts = np.stack(cols[:c], 1).astype(np.float32)
pad = np.zeros((int(n_points * 1.2), c), np.float32)
pad[:n_points] = pts[:, :c]
mask = np.zeros((len(pad),), bool)
mask[:n_points] = True
pad_j, mask_j = jnp.asarray(pad), jnp.asarray(mask)

init_example = {"points": pad_j[None, :2048],
                "points_mask": mask_j[None, :2048]}
variables = det.init(jax.random.PRNGKey(0), init_example)


def make_frame():
    # fresh jit wrapper per arm so the env gate is re-read at trace time
    @jax.jit
    def frame(variables, points, pmask):
        example = {"points": points[None], "points_mask": pmask[None]}
        return det.predict(variables, example)
    return frame


def sync(out):
    np.asarray(out["scores"][0, :1])


os.environ["PARTNER_TPU_PALLAS_BLOCK"] = "0"
frame_xla = make_frame()
print("compiling XLA arm...", flush=True)
sync(frame_xla(variables, pad_j, mask_j))

os.environ["PARTNER_TPU_PALLAS_BLOCK"] = "1"
frame_fused = make_frame()
print("compiling fused arm...", flush=True)
sync(frame_fused(variables, pad_j, mask_j))

a = frame_xla(variables, pad_j, mask_j)
b = frame_fused(variables, pad_j, mask_j)
max_d = float(jnp.max(jnp.abs(a["box3d_lidar"] - b["box3d_lidar"])))
score_d = float(jnp.max(jnp.abs(a["scores"] - b["scores"])))
print(f"decode diff {max_d:.2e} score diff {score_d:.2e}", flush=True)

N = 30


def window(frame):
    for _ in range(4):
        out = frame(variables, pad_j, mask_j)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = frame(variables, pad_j, mask_j)
    sync(out)
    return N / (time.perf_counter() - t0)


xla_w, fused_w = [], []
for r in range(4):
    xla_w.append(window(frame_xla))
    fused_w.append(window(frame_fused))
    print(f"round {r}: xla {xla_w[-1]:.2f} fused {fused_w[-1]:.2f}",
          flush=True)

# ---- standalone two-block micro at flagship post-embed shapes ----
from partner_tpu.models.swin_vote import SwinVoteTransformer  # noqa: E402

H, W, C = 256, 144, 256
krng = np.random.RandomState(1)
x_in = jnp.asarray(krng.randn(1, H, W, 512).astype(np.float32))
pos = jnp.asarray(krng.randn(1, H, W, 2).astype(np.float32))
vote = jnp.asarray(krng.randn(1, H, W, 3).astype(np.float32))

mdl_xla = SwinVoteTransformer(embed_dim=C, depth=2, num_heads=4,
                              window_size=8, compute_dtype="bfloat16",
                              use_block_kernel=False)
mdl_fused = mdl_xla.clone(use_block_kernel=True)
mvars = mdl_xla.init(jax.random.PRNGKey(2), x_in, pos, vote)
run_xla = jax.jit(lambda v, x: mdl_xla.apply(v, x, pos, vote))
run_fused = jax.jit(lambda v, x: mdl_fused.apply(v, x, pos, vote))
np.asarray(run_xla(mvars, x_in))[0, 0, 0, 0]
np.asarray(run_fused(mvars, x_in))[0, 0, 0, 0]
blk_d = float(jnp.max(jnp.abs(run_xla(mvars, x_in)
                              - run_fused(mvars, x_in))))


def micro(fn):
    best = 1e9
    for _ in range(4):
        for _ in range(3):
            out = fn(mvars, x_in)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(mvars, x_in)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 20)
    return best * 1e3


blk_xla_ms = micro(run_xla)
blk_fused_ms = micro(run_fused)

res = {
    "xla_fps": round(max(xla_w), 3),
    "fused_fps": round(max(fused_w), 3),
    "xla_windows": [round(v, 2) for v in xla_w],
    "fused_windows": [round(v, 2) for v in fused_w],
    "speedup_pct": round(100 * (max(fused_w) / max(xla_w) - 1), 2),
    "decode_max_abs_diff": max_d,
    "score_max_abs_diff": score_d,
    "block_xla_ms": round(blk_xla_ms, 3),
    "block_fused_ms": round(blk_fused_ms, 3),
    "block_max_abs_diff": blk_d,
}
print(json.dumps(res), flush=True)

"""In-process on-chip A/B: static-RPE cache vs live RPE rebuild.

The static-RPE cache (swin_vote.WindowAttention `rpe_cache`,
E2EDetector.prepare_inference) replaces the per-frame decomposed RPE
rebuild — a (nB, T, T, hidden) pair tensor per SwinVote block — with a
precomputed frame-invariant (nW, nh, T, T) bias table. Expected win is
small (~1 ms of a ~20 ms frame), so cross-process capture variance
(~2%) would swamp it; this probe times BOTH arms in one process, windows
interleaved A/B/A/B, unbounded-dispatch protocol (the bench regime).

Writes one JSON line: {"live_fps": ..., "cached_fps": ..., ...}.

Measured on chip 2026-08-19 (see PERF.md "static-RPE cache"):
  live 50.89 FPS (windows 50.0-50.9) vs cached 49.70 (49.6-49.7),
  decode max abs diff 0.0. Verdict: REFUTED (-2.3%) — the decomposed
  rebuild fuses into the attention einsum pipeline; the table read adds
  an HBM dependency on the softmax critical path. Default stays OFF.
"""
import json
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
t0 = time.perf_counter()
warmed = det.prepare_inference(variables, init_example)
prep_s = time.perf_counter() - t0
assert "rpe_cache" in warmed


@jax.jit
def frame(variables, points, pmask):
    example = {"points": points[None], "points_mask": pmask[None]}
    return det.predict(variables, example)


def sync(out):
    np.asarray(out["scores"][0, :1])


print("compiling both arms...", flush=True)
sync(frame(variables, pad_j, mask_j))   # live trace (no rpe_cache leaf)
sync(frame(warmed, pad_j, mask_j))      # cached trace (extra collection)
# numerical sanity on chip: cached == live decode
a = frame(variables, pad_j, mask_j)
b = frame(warmed, pad_j, mask_j)
max_d = float(jnp.max(jnp.abs(a["box3d_lidar"] - b["box3d_lidar"])))

N = 30


def window(v):
    for _ in range(4):
        out = frame(v, pad_j, mask_j)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = frame(v, pad_j, mask_j)
    sync(out)
    return N / (time.perf_counter() - t0)


live, cached = [], []
for r in range(4):
    live.append(window(variables))
    cached.append(window(warmed))
    print(f"round {r}: live {live[-1]:.2f} cached {cached[-1]:.2f}",
          flush=True)

res = {
    "live_fps": round(max(live), 3),
    "cached_fps": round(max(cached), 3),
    "live_windows": [round(v, 2) for v in live],
    "cached_windows": [round(v, 2) for v in cached],
    "speedup_pct": round(100 * (max(cached) / max(live) - 1), 2),
    "prepare_inference_s": round(prep_s, 2),
    "decode_max_abs_diff": max_d,
}
print(json.dumps(res), flush=True)

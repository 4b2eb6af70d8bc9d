"""Dispatch-regime A/B on the flagship frame fn.

Question (VERDICT r3 #3): can host-side double-buffered dispatch — two
in-flight frames, latency contract preserved — recover throughput the
current protocol leaves on the table?

Regimes (same compiled fn, same inputs):
  inf : enqueue whole window, fence once   (current bench protocol)
  2   : keep exactly 2 frames in flight    (double buffering)
  1   : fence every frame                  (serial dispatch)

Plus a two-program overlap probe: P1 = scatter-max (serial, FLOP-free),
P2 = matmul chain (MXU). If one core could overlap programs, interleaved
P1/P2 enqueue would beat sequential.

Measured on chip 2026-08-19 (see PERF.md "Round-4 on-chip A/B"):
  inflight_inf 49.98 FPS | inflight_2 20.93 | inflight_1 20.62
  overlap_seq 30.23 ms/pair | overlap_inter 30.48 ms/pair
Verdict: double-buffered dispatch REFUTED (host fence via the tunnel
costs ~28.5 ms RPC); no on-core program overlap exists.
"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from partner_tpu.models import build_detector
from partner_tpu.train.config import Config

cfg = Config.fromfile("/root/repo/configs/waymo/waymo_partner_36epoch.py")
det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
grid = tuple(cfg.grid_size)
pc_range = cfg.voxel_generator["range"]
n_points = 180000

rng = np.random.RandomState(0)
c = det.module.reader_cfg.get("num_input_features", 7)
rho = np.exp(rng.uniform(np.log(pc_range[0] + 0.2),
                         np.log(pc_range[3] - 0.2), n_points))
z = pc_range[2] + np.abs(rng.randn(n_points)) * 0.18 * (pc_range[5] - pc_range[2])
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

init_example = {"points": pad_j[None, :2048], "points_mask": mask_j[None, :2048]}
variables = det.init(jax.random.PRNGKey(0), init_example)

@jax.jit
def frame(variables, points, pmask):
    example = {"points": points[None], "points_mask": pmask[None]}
    return det.predict(variables, example)

def sync(out):
    np.asarray(out["scores"][0, :1])

print("compiling...", flush=True)
sync(frame(variables, pad_j, mask_j))
sync(frame(variables, pad_j, mask_j))

N = 20
results = {}

def run_depth(depth):
    # warm
    for _ in range(4):
        out = frame(variables, pad_j, mask_j)
    sync(out)
    t0 = time.perf_counter()
    if depth is None:                      # unbounded in-flight
        for _ in range(N):
            out = frame(variables, pad_j, mask_j)
        sync(out)
    elif depth == 2:
        prev = None
        for _ in range(N):
            out = frame(variables, pad_j, mask_j)
            if prev is not None:
                sync(prev)                 # frame i-1 fenced after i enqueued
            prev = out
        sync(prev)
    else:                                  # depth == 1
        for _ in range(N):
            out = frame(variables, pad_j, mask_j)
            sync(out)
    return N / (time.perf_counter() - t0)

for name, d in [("inflight_inf", None), ("inflight_2", 2), ("inflight_1", 1)]:
    vals = [run_depth(d) for _ in range(2)]
    results[name + "_fps"] = round(max(vals), 3)
    print(name, [round(v, 2) for v in vals], flush=True)

# ---- two-program overlap probe ----
CELLS = 20 * 468 * 468
upd = jnp.asarray(rng.rand(216000, 64).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.randint(0, CELLS, 216000).astype(np.int32))
A = jnp.asarray(rng.rand(4096, 4096).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def p_scatter(u, i):
    return jnp.zeros((CELLS, 64), jnp.bfloat16).at[i].max(u, mode="drop")

@jax.jit
def p_matmul(x):
    for _ in range(8):
        x = jnp.tanh(x @ x)
    return x

np.asarray(p_scatter(upd, idx)[:1, :1]); np.asarray(p_matmul(A)[:1, :1])

def fence(a, b):
    np.asarray(a[:1, :1]); np.asarray(b[:1, :1])

M = 15
# sequential: all scatters then all matmuls
for _ in range(2):
    s = p_scatter(upd, idx); m = p_matmul(A); fence(s, m)
t0 = time.perf_counter()
for _ in range(M):
    s = p_scatter(upd, idx)
for _ in range(M):
    m = p_matmul(A)
fence(s, m)
seq = time.perf_counter() - t0
# interleaved: scatter_{i+1} enqueued while matmul_i "runs"
t0 = time.perf_counter()
for _ in range(M):
    s = p_scatter(upd, idx)
    m = p_matmul(A)
fence(s, m)
inter = time.perf_counter() - t0
results["overlap_seq_ms"] = round(seq / M * 1e3, 3)
results["overlap_inter_ms"] = round(inter / M * 1e3, 3)
print(json.dumps(results), flush=True)

"""Stage-wise wall-clock breakdown of the flagship inference frame.

Times nested prefixes of the pipeline as separate jitted programs on the
real chip — encode (points -> BEV), + re-alignment attention, + neck,
+ head maps, + decode/NMS — so MFU work targets the measured hot stage
(per-op microbenchmarks mislead on the remote backend; see
VERDICT r1 weak #4). Differences between consecutive prefixes are the
per-stage costs, measured under identical dispatch conditions.

Usage: python tools/profile_flagship.py [--scale full|half] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="full", choices=["full", "half"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dist", default="realistic")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    ge._enable_compile_cache()

    from partner_tpu.models import build_detector
    from partner_tpu.train.config import Config

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/waymo/waymo_partner_36epoch.py"))
    det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    grid = tuple(cfg.grid_size)
    pc_range = cfg.voxel_generator["range"]
    n_points = 180000 if args.scale == "full" else 90000

    rng = np.random.RandomState(0)
    c = det.module.reader_cfg.get("num_input_features", 7)
    if args.dist == "realistic":
        rho = np.exp(rng.uniform(np.log(pc_range[0] + 0.2),
                                 np.log(pc_range[3] - 0.2), n_points))
        z = np.clip(pc_range[2] + np.abs(rng.randn(n_points)) * 0.18
                    * (pc_range[5] - pc_range[2]), pc_range[2], pc_range[5])
    else:
        rho = rng.uniform(pc_range[0] + 0.2, pc_range[3] - 0.2, n_points)
        z = rng.uniform(pc_range[2], pc_range[5], n_points)
    phi = rng.uniform(pc_range[1], pc_range[4], n_points)
    cols = [rho, phi, z, rho * np.cos(phi), rho * np.sin(phi)]
    while len(cols) < c:
        cols.append(rng.rand(n_points))
    pts = np.stack(cols[:c], 1).astype(np.float32)
    pad = np.zeros((int(n_points * 1.2), c), np.float32)
    pad[:n_points] = pts
    mask = np.zeros((len(pad),), bool)
    mask[:n_points] = True
    pad_j, mask_j = jnp.asarray(pad), jnp.asarray(mask)

    init_example = {"points": pad_j[None, :2048],
                    "points_mask": mask_j[None, :2048]}
    variables = det.init(jax.random.PRNGKey(0), init_example)
    module = det.module

    def m_encode(m, points, pmask):
        return m.backbone.encode_points(points, pmask, m.grid_size,
                                        m.pc_range, train=False)[0]

    def m_attn(m, points, pmask):
        bev = m.backbone.encode_points(points, pmask, m.grid_size,
                                       m.pc_range, train=False)[0]
        if m.with_set_attention:
            x = bev.transpose(0, 2, 1, 3)
            pos = jnp.broadcast_to(m.bev_pos[None], x.shape[:3] + (2,))
            x = m.attns(x, pos, deterministic=True, train=False)
            bev = x.transpose(0, 2, 1, 3)
        return bev

    def m_neck(m, points, pmask):
        bev = m_attn(m, points, pmask)
        return m.neck(bev, train=False)

    def m_maps(m, points, pmask):
        return m({"points": points, "points_mask": pmask}, train=False)

    stages = [
        ("encode", lambda v, p, q: module.apply(
            v, p[None], q[None], method=m_encode)),
        ("+attn", lambda v, p, q: module.apply(
            v, p[None], q[None], method=m_attn)),
        ("+neck", lambda v, p, q: module.apply(
            v, p[None], q[None], method=m_neck)),
        ("+head", lambda v, p, q: module.apply(
            v, p[None], q[None], method=m_maps)),
        ("+decode/nms", lambda v, p, q: det.predict(
            v, {"points": p[None], "points_mask": q[None]})),
    ]

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    results = []
    for name, fn in stages:
        jf = jax.jit(fn)
        fence(jf(variables, pad_j, mask_j))  # compile
        for _ in range(3):
            out = jf(variables, pad_j, mask_j)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(variables, pad_j, mask_j)
        fence(out)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        results.append((name, ms))
        prev = results[-2][1] if len(results) > 1 else 0.0
        print(f"{name:>12}: {ms:8.2f} ms  (stage delta {ms - prev:+7.2f} ms)",
              flush=True)

    total = results[-1][1]
    print("\nbreakdown of the full frame:")
    prev = 0.0
    for name, ms in results:
        print(f"  {name:>12}: cumulative {ms:7.2f} ms, "
              f"stage {ms - prev:7.2f} ms ({(ms - prev) / total * 100:5.1f}%)")
        prev = ms


if __name__ == "__main__":
    main()

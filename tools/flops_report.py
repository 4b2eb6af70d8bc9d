"""Per-module FLOPs attribution table for any config's forward pass.

The reference prints a per-layer FLOPs/params table from a hook-based
counter (/root/reference/det3d/utils/flops_counter.py:60-90). Here the
table falls out of the traced jaxpr: every equation carries the flax
module path in its name stack, so dot/conv FLOPs attribute mechanically
(partner_tpu/utils/flops.py:per_module_flops) — no hooks, no surgery,
and it runs on CPU (tracing only, nothing executes).

Usage:
  python tools/flops_report.py [--config configs/waymo/waymo_partner_36epoch.py]
                               [--depth 3] [--points 180000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/waymo/waymo_partner_36epoch.py")
    p.add_argument("--depth", type=int, default=3,
                   help="module-path components to group by")
    p.add_argument("--points", type=int, default=180000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from partner_tpu.models import build_detector
    from partner_tpu.train.config import Config
    from partner_tpu.utils.flops import per_module_flops

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(root, args.config))
    det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    pc_range = cfg.voxel_generator["range"]
    n = args.points

    rng = np.random.RandomState(0)
    c = det.module.reader_cfg.get("num_input_features", 7)
    rho = np.exp(rng.uniform(np.log(pc_range[0] + 0.2),
                             np.log(pc_range[3] - 0.2), n))
    z = np.clip(pc_range[2] + np.abs(rng.randn(n)) * 0.18
                * (pc_range[5] - pc_range[2]), pc_range[2], pc_range[5])
    phi = rng.uniform(pc_range[1], pc_range[4], n)
    cols = [rho, phi, z, rho * np.cos(phi), rho * np.sin(phi)]
    while len(cols) < c:
        cols.append(rng.rand(n))
    pts = np.stack(cols[:c], 1).astype(np.float32)
    pad = np.zeros((int(n * 1.2), c), np.float32)
    pad[:n] = pts
    mask = np.zeros((len(pad),), bool)
    mask[:n] = True
    example = {"points": jnp.asarray(pad)[None],
               "points_mask": jnp.asarray(mask)[None]}

    variables = det.init(jax.random.PRNGKey(0), example)
    tbl = per_module_flops(
        lambda v, ex: det.predict(v, ex), variables, example,
        depth=args.depth)

    total = sum(tbl.values())
    width = max(len(k) for k in tbl)
    print(f"{'module':<{width}}  {'GFLOP':>10}  {'%':>6}")
    for k, v in tbl.items():
        print(f"{k:<{width}}  {v / 1e9:10.2f}  {100 * v / total:6.2f}")
    print(f"{'TOTAL':<{width}}  {total / 1e9:10.2f}")


if __name__ == "__main__":
    main()

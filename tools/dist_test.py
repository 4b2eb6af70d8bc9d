"""Evaluation CLI — the det3d tools/dist_test.py equivalent.

Usage: python tools/dist_test.py CONFIG --checkpoint CKPT [--work_dir D]
       [--speed_test] [--max_frames N]

Runs the jitted predict step over the val set, gathers per-token detections,
measures middle-third wall-clock FPS (the reference protocol,
tools/dist_test.py:155-168,203), saves prediction.pkl and calls
dataset.evaluation.
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--work_dir", default="./eval_out")
    p.add_argument("--speed_test", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--max_points", type=int, default=200000)
    p.add_argument("--batch_size", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from partner_tpu.data import build_dataloader, build_dataset
    from partner_tpu.models import build_detector
    from partner_tpu.ops import voxelize
    from partner_tpu.train.checkpoint import load_checkpoint
    from partner_tpu.train.config import Config
    from partner_tpu.train.hooks import get_logger
    from partner_tpu.parallel import dist

    dist.initialize()

    cfg = Config.fromfile(args.config)
    os.makedirs(args.work_dir, exist_ok=True)
    logger = get_logger(args.work_dir)

    det = build_detector(cfg.model, cfg.get("train_cfg"), cfg.get("test_cfg"))
    dataset = build_dataset(dict(cfg.data["val"]))
    loader = build_dataloader(
        dataset, args.batch_size, workers_per_gpu=4, shuffle=False,
        max_points=args.max_points,
    )

    vg = dict(cfg.voxel_generator)
    grid = tuple(
        int(round((vg["range"][3 + i] - vg["range"][i]) / vg["voxel_size"][i]))
        for i in range(3)
    )
    max_voxels = vg.get("max_voxel_num", 150000)
    if not isinstance(max_voxels, int):
        max_voxels = max_voxels[1]
    voxel_size = jnp.asarray(vg["voxel_size"], dtype=jnp.float32)
    pc_range = jnp.asarray(vg["range"], dtype=jnp.float32)

    # init / load
    small = {
        "features": jnp.zeros((1, 256, dataset.NumPointFeatures + 2)),
        "coords": jnp.zeros((1, 256, 3), jnp.int32),
        "voxel_mask": jnp.zeros((1, 256), bool),
    }
    variables = det.init(jax.random.PRNGKey(0), small)
    if args.checkpoint:
        payload, _ = load_checkpoint(args.checkpoint)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda t, v: jnp.asarray(v), variables["params"],
                payload["params"],
            ),
            "batch_stats": jax.tree_util.tree_map(
                lambda t, v: jnp.asarray(v),
                variables.get("batch_stats", {}), payload["batch_stats"],
            ),
        }
        logger.info(f"loaded {args.checkpoint}")

    @jax.jit
    def predict(variables, points, pmask):
        def vox_one(p, m):
            v = voxelize.dynamic_voxelize(
                p, m, voxel_size, pc_range, grid, max_voxels=max_voxels
            )
            return v["features"], v["coords"], v["mask"]

        feats, coords, vmask = jax.vmap(vox_one)(points, pmask)
        ex = {"features": feats, "coords": coords, "voxel_mask": vmask}
        return det.predict(variables, ex)

    detections = {}
    times = []
    n_frames = 0
    for batch in loader:
        t0 = time.perf_counter()
        out = predict(
            variables, jnp.asarray(batch["points"]),
            jnp.asarray(batch["points_mask"]),
        )
        out = jax.tree_util.tree_map(np.asarray, out)
        times.append(time.perf_counter() - t0)
        for i, meta in enumerate(batch["metadata"]):
            token = meta["token"] if meta else str(n_frames)
            m = out["mask"][i]
            detections[token] = {
                "box3d_lidar": out["box3d_lidar"][i][m],
                "scores": out["scores"][i][m],
                "label_preds": out["label_preds"][i][m],
                "metadata": meta,
            }
            n_frames += 1
        if args.max_frames and n_frames >= args.max_frames:
            break

    third = max(1, len(times) // 3)
    window = times[third : 2 * third] or times
    fps = args.batch_size * len(window) / sum(window)
    logger.info(f"frames: {n_frames}, middle-third FPS: {fps:.2f}")

    # gather per-host detections (the reference's pickle all_gather,
    # tools/dist_test.py:197-201) and evaluate on the main process
    gathered = dist.all_gather_object(detections)
    if dist.is_main_process():
        merged = {}
        for d in gathered:
            merged.update(d)
        with open(os.path.join(args.work_dir, "prediction.pkl"), "wb") as f:
            pickle.dump(merged, f)
        result = dataset.evaluation(merged, output_dir=args.work_dir)
        logger.info(f"evaluation: {result}")


if __name__ == "__main__":
    main()

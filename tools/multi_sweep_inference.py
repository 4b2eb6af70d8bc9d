"""Offline streaming multi-sweep inference.

Equivalent of /root/reference/tools/multi_sweep_inference.py:106-160
without the ROS transport: frames are read from an info pkl in timestamp
order; a deque of the last `nsweeps` point clouds is maintained, each
transformed into the current ego frame by the relative pose (the
reference's odometry-driven transform chain), concatenated with per-point
time lags, and fed to the jitted detector.

Usage:
  python tools/multi_sweep_inference.py CONFIG --info_path infos.pkl \\
      [--checkpoint CKPT] [--nsweeps 5] [--max_frames N]
"""

import argparse
import os
import pickle
import sys
import time
from collections import deque

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def transform_points(points, tm):
    out = points.copy()
    hom = np.concatenate(
        [points[:, :3], np.ones((len(points), 1), points.dtype)], axis=1)
    out[:, :3] = (tm @ hom.T).T[:, :3]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--info_path", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--nsweeps", type=int, default=5)
    p.add_argument("--max_points", type=int, default=200000)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--work_dir", default="./msi_out")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from partner_tpu.core import box_np_ops
    from partner_tpu.data.pipeline import get_obj, read_single_waymo
    from partner_tpu.models import build_detector
    from partner_tpu.ops import voxelize
    from partner_tpu.train.checkpoint import load_checkpoint
    from partner_tpu.train.config import Config

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model, cfg.get("train_cfg"), cfg.get("test_cfg"))
    vg = dict(cfg.voxel_generator)
    grid = tuple(int(round((vg["range"][3 + i] - vg["range"][i])
                           / vg["voxel_size"][i])) for i in range(3))
    mv = vg.get("max_voxel_num", 150000)
    mv = mv if isinstance(mv, int) else mv[0]
    vs = jnp.asarray(vg["voxel_size"], jnp.float32)
    pr = jnp.asarray(vg["range"], jnp.float32)
    shape = vg.get("voxel_shape", "cylinder")
    n_feat = cfg.model["reader"].get("num_input_features", 7)

    small = {
        "features": jnp.zeros((1, 256, n_feat)),
        "coords": jnp.zeros((1, 256, 3), jnp.int32),
        "voxel_mask": jnp.zeros((1, 256), bool),
    }
    variables = det.init(jax.random.PRNGKey(0), small)
    if args.checkpoint:
        payload, _ = load_checkpoint(args.checkpoint)
        variables = {
            "params": payload["params"],
            "batch_stats": payload.get("batch_stats", {}),
        }

    @jax.jit
    def predict(variables, points, pmask):
        v = voxelize.dynamic_voxelize(points, pmask, vs, pr, grid,
                                      max_voxels=mv)
        ex = {"features": v["features"][None], "coords": v["coords"][None],
              "voxel_mask": v["mask"][None]}
        return det.predict(variables, ex)

    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)
    infos.sort(key=lambda i: i.get("timestamp", 0))

    sweeps = deque(maxlen=args.nsweeps)  # (points_cart, pose, timestamp)
    detections = {}
    times = []
    for n, info in enumerate(infos):
        if args.max_frames and n >= args.max_frames:
            break
        pts = (info["points"] if "points" in info
               else read_single_waymo(get_obj(info["path"])))
        pose = np.asarray(info.get("pose", np.eye(4)), np.float64)
        ts = float(info.get("timestamp", n))
        sweeps.append((pts, pose, ts))

        # concat sweeps in the CURRENT frame with time-lag channel
        inv = np.linalg.inv(pose)
        chunks = []
        for sp, spose, sts in sweeps:
            rel = inv @ spose
            moved = transform_points(sp.astype(np.float32),
                                     rel.astype(np.float32))
            lag = np.full((len(moved), 1), ts - sts, np.float32)
            chunks.append(np.concatenate([moved, lag], axis=1))
        cat = np.concatenate(chunks)

        polar = box_np_ops.transform_points(cat[:, :3], shape)
        feats = np.concatenate([polar, cat[:, 3:]], axis=1)[:, :n_feat]
        pad = np.zeros((args.max_points, n_feat), np.float32)
        mask = np.zeros((args.max_points,), bool)
        k = min(len(feats), args.max_points)
        pad[:k] = feats[:k]
        mask[:k] = True

        t0 = time.perf_counter()
        out = predict(variables, jnp.asarray(pad), jnp.asarray(mask))
        out = jax.tree_util.tree_map(np.asarray, out)
        times.append(time.perf_counter() - t0)
        m = out["mask"][0]
        detections[info.get("token", str(n))] = {
            "box3d_lidar": out["box3d_lidar"][0][m],
            "scores": out["scores"][0][m],
            "label_preds": out["label_preds"][0][m],
        }

    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, "prediction.pkl"), "wb") as f:
        pickle.dump(detections, f)
    third = max(1, len(times) // 3)
    window = times[third: 2 * third] or times
    print(f"{len(detections)} frames; middle-third FPS "
          f"{len(window) / sum(window):.2f}")


if __name__ == "__main__":
    main()

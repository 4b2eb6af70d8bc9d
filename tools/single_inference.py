"""Online single-sweep inference (the ROS node, transport-gated).

Equivalent of /root/reference/tools/single_infernece.py: subscribe to a
point-cloud stream, voxelize, run the jitted detector, publish/emit boxes.
ROS is not part of this image, so the transport is pluggable:

  * with ``--ros`` and rospy importable: subscribes to ``--topic``
    (sensor_msgs/PointCloud2) and publishes MarkerArray-style results on
    ``--out_topic`` — the reference's node layout.
  * otherwise: "file transport" — watches ``--watch_dir`` for new ``.bin``
    / ``.npy`` point files (the common offline stand-in for a live sensor),
    processes each once, writes ``<frame>.det.npz`` next to it.

Either way the per-frame path is identical to the reference node: points ->
polar transform -> device dynamic voxelization -> detector -> score filter
(single_infernece.py:128-137 timing bracket included).

Usage:
  python tools/single_inference.py CONFIG --watch_dir /data/frames \\
      [--checkpoint CKPT] [--score 0.3] [--once]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def build_predictor(cfg, checkpoint=None, max_points=200000):
    """(variables, predict_fn, meta) for single-frame polar inference."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.models import build_detector
    from partner_tpu.ops import voxelize
    from partner_tpu.train.checkpoint import load_checkpoint

    det = build_detector(cfg.model, cfg.get("train_cfg"), cfg.get("test_cfg"))
    vg = dict(cfg.voxel_generator)
    grid = tuple(int(round((vg["range"][3 + i] - vg["range"][i])
                           / vg["voxel_size"][i])) for i in range(3))
    mv = vg.get("max_voxel_num", 150000)
    mv = mv if isinstance(mv, int) else mv[0]
    vs = jnp.asarray(vg["voxel_size"], jnp.float32)
    pr = jnp.asarray(vg["range"], jnp.float32)
    n_feat = cfg.model["reader"].get("num_input_features", 7)

    small = {
        "features": jnp.zeros((1, 256, n_feat)),
        "coords": jnp.zeros((1, 256, 3), jnp.int32),
        "voxel_mask": jnp.zeros((1, 256), bool),
    }
    variables = det.init(jax.random.PRNGKey(0), small)
    if checkpoint:
        payload, _ = load_checkpoint(checkpoint)
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}

    @jax.jit
    def predict(variables, points, pmask):
        v = voxelize.dynamic_voxelize(points, pmask, vs, pr, grid,
                                      max_voxels=mv)
        ex = {"features": v["features"][None], "coords": v["coords"][None],
              "voxel_mask": v["mask"][None]}
        return det.predict(variables, ex)

    meta = dict(n_feat=n_feat, max_points=max_points,
                voxel_shape=vg.get("voxel_shape", "cylinder"))
    return variables, predict, meta


def run_frame(variables, predict, meta, cart_points, score_threshold=0.3):
    """One frame: cartesian points (N, >=3[+feats]) -> filtered boxes."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.core import box_np_ops

    # transform the FULL feature array so extras land in the layout's
    # proper slots (cylinder: [rho,phi,z,x,y,*extra]; cuboid:
    # [x,y,z,*extra,rho,phi] — extras sit BEFORE rho/phi, box_np_ops:99)
    feats = box_np_ops.transform_points(cart_points, meta["voxel_shape"])
    feats = feats[:, :meta["n_feat"]].astype(np.float32)
    if feats.shape[1] < meta["n_feat"]:
        feats = np.pad(feats,
                       ((0, 0), (0, meta["n_feat"] - feats.shape[1])))
    pad = np.zeros((meta["max_points"], meta["n_feat"]), np.float32)
    mask = np.zeros((meta["max_points"],), bool)
    k = min(len(feats), meta["max_points"])
    pad[:k] = feats[:k]
    mask[:k] = True

    t0 = time.perf_counter()
    out = predict(variables, jnp.asarray(pad), jnp.asarray(mask))
    out = jax.tree_util.tree_map(np.asarray, out)
    dt = time.perf_counter() - t0
    keep = out["mask"][0] & (out["scores"][0] >= score_threshold)
    return {
        "box3d_lidar": out["box3d_lidar"][0][keep],
        "scores": out["scores"][0][keep],
        "label_preds": out["label_preds"][0][keep],
        "time": dt,
    }


def _load_points(path):
    if path.endswith(".npy"):
        return np.load(path)
    raw = np.fromfile(path, dtype=np.float32)
    for width in (5, 4, 3):
        if raw.size % width == 0:
            return raw.reshape(-1, width)
    raise ValueError(f"cannot infer point width of {path}")


def _file_loop(args, cfg):
    variables, predict, meta = build_predictor(cfg, args.checkpoint,
                                               args.max_points)
    seen = set()
    print(f"[single_inference] watching {args.watch_dir}")
    while True:
        frames = sorted(
            f for f in os.listdir(args.watch_dir)
            if f.endswith((".bin", ".npy")) and f not in seen
        )
        for f in frames:
            seen.add(f)
            pts = _load_points(os.path.join(args.watch_dir, f))
            det = run_frame(variables, predict, meta, pts, args.score)
            out = os.path.join(args.watch_dir,
                               os.path.splitext(f)[0] + ".det.npz")
            np.savez(out, **{k: v for k, v in det.items() if k != "time"})
            print(f"{f}: {len(det['scores'])} dets in {det['time']*1e3:.1f} ms")
        if args.once:
            return
        time.sleep(args.poll)


def _ros_loop(args, cfg):  # pragma: no cover - needs a ROS runtime
    import rospy
    import sensor_msgs.point_cloud2 as pc2
    from sensor_msgs.msg import PointCloud2
    from std_msgs.msg import String

    variables, predict, meta = build_predictor(cfg, args.checkpoint,
                                               args.max_points)
    pub = rospy.Publisher(args.out_topic, String, queue_size=1)

    def cb(msg):
        pts = np.array(list(pc2.read_points(
            msg, field_names=("x", "y", "z", "intensity"),
            skip_nans=True)), dtype=np.float32)
        det = run_frame(variables, predict, meta, pts, args.score)
        pub.publish(String(data=repr({
            k: v.tolist() for k, v in det.items() if k != "time"})))

    rospy.init_node("partner_tpu_single_inference")
    rospy.Subscriber(args.topic, PointCloud2, cb, queue_size=1,
                     buff_size=2 ** 24)
    rospy.spin()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--score", type=float, default=0.3)
    p.add_argument("--max_points", type=int, default=200000)
    p.add_argument("--ros", action="store_true")
    p.add_argument("--topic", default="/points_raw")
    p.add_argument("--out_topic", default="/partner_detections")
    p.add_argument("--watch_dir", default="./frames")
    p.add_argument("--poll", type=float, default=0.05)
    p.add_argument("--once", action="store_true",
                   help="process current files and exit (no watch loop)")
    args = p.parse_args()

    from partner_tpu.train.config import Config

    cfg = Config.fromfile(args.config)
    if args.ros:
        _ros_loop(args, cfg)
    else:
        _file_loop(args, cfg)


if __name__ == "__main__":
    main()

"""Evaluation CLI — the det3d tools/dist_test.py equivalent.

Usage: python tools/dist_test.py CONFIG --checkpoint CKPT [--work_dir D]
       [--speed_test] [--max_frames N] [--input auto|points|voxels]

Runs the jitted predict step over the val set, gathers per-token results,
measures middle-third wall-clock FPS (the reference protocol,
tools/dist_test.py:155-168,203), saves prediction.pkl and calls
dataset.evaluation.

Routing (reference tools/dist_test.py:161-216 collects det + seg + ins
from every model through one example dict):
- detectors with ``input_kind == "points"`` (PolarStream/STROBE/
  PointPillars streaming families, and the flagship's dense-backbone point
  fast path) get the raw padded (points, points_mask) batch;
- voxel-contract detectors get a device dynamic-voxelization preamble;
- ``point_seg_labels`` outputs are collected per token, matched against
  the dataset's gt label files, and panoptic instance ids are fused from
  the detections (seg_head.panoptic_fuse) so NuScenes evaluation returns
  the full (det, mIoU, PQ) 3-tuple.
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# nuScenes lidarseg semantic ids (post 32->17 merge) for the 10 detection
# "thing" classes, mapped to NuScenesDataset.CLASSES det label indices
NUSC_THING_CLASSES = tuple(range(1, 11))
NUSC_SEMANTIC2BOX = {1: 5, 2: 7, 3: 3, 4: 0, 5: 2,
                     6: 6, 7: 8, 8: 9, 9: 4, 10: 1}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--work_dir", default="./eval_out")
    p.add_argument("--speed_test", action="store_true")
    p.add_argument("--testset", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--max_points", type=int, default=200000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--input", choices=["auto", "points", "voxels"],
                   default="auto",
                   help="example contract fed to the detector; auto uses "
                        "the detector's declared input_kind")
    return p.parse_args()


def build_predict_fn(det, cfg, dataset, kind):
    """Jitted predict closure for either input contract."""
    import jax
    import jax.numpy as jnp

    from partner_tpu.ops import voxelize

    if kind == "points":

        @jax.jit
        def predict(variables, points, pmask):
            return det.predict(
                variables, {"points": points, "points_mask": pmask})

        return predict

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

    @jax.jit
    def predict(variables, points, pmask):
        def vox_one(p, m):
            v = voxelize.dynamic_voxelize(
                p, m, voxel_size, pc_range, grid, max_voxels=max_voxels
            )
            return v["features"], v["coords"], v["mask"]

        feats, coords, vmask = jax.vmap(vox_one)(points, pmask)
        ex = {"features": feats, "coords": coords, "voxel_mask": vmask,
              "points": points, "points_mask": pmask}
        return det.predict(variables, ex)

    return predict


def init_example(det, dataset, kind, max_points):
    """Tiny example for parameter init under the chosen contract."""
    import jax.numpy as jnp

    nf = dataset.NumPointFeatures + 2  # + rho, phi decoration columns
    if kind == "points":
        return {
            "points": jnp.zeros((1, 1024, nf)),
            "points_mask": jnp.zeros((1, 1024), bool),
        }
    return {
        "features": jnp.zeros((1, 256, nf)),
        "coords": jnp.zeros((1, 256, 3), jnp.int32),
        "voxel_mask": jnp.zeros((1, 256), bool),
    }


def load_seg_gt(info):
    """Key-frame gt semantic labels from the info's lidarseg path."""
    from partner_tpu.data.pipeline import NUSCENES_SEMANTIC_MAPPING

    path = info.get("lidarseg_path")
    if not path or not os.path.exists(path):
        return None
    raw = np.fromfile(path, dtype=np.uint8)
    return np.vectorize(NUSCENES_SEMANTIC_MAPPING.get)(raw).astype(np.int64)


def main():
    args = parse_args()
    import jax

    from partner_tpu.data import build_dataloader, build_dataset
    from partner_tpu.models import build_detector
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
    kind = args.input if args.input != "auto" else getattr(
        det, "input_kind", "voxels")
    logger.info(f"model type {cfg.model['type']}, input contract: {kind}")

    variables = det.init(jax.random.PRNGKey(0),
                         init_example(det, dataset, kind, args.max_points))
    if args.checkpoint:
        import jax.numpy as jnp

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

    predict = build_predict_fn(det, cfg, dataset, kind)

    import jax.numpy as jnp

    infos_by_token = {info.get("token", str(i)): info
                      for i, info in enumerate(dataset.infos)}
    # cartesian xy column positions in the point layout (core/box_np_ops
    # transform_points: cylinder = [rho, phi, z, x, y, ...]; cuboid keeps
    # [x, y, ...] up front) — needed for panoptic instance fusion
    vshape = dict(cfg.get("voxel_generator", {})).get("voxel_shape",
                                                      "cylinder")
    xy_cols = slice(3, 5) if vshape == "cylinder" else slice(0, 2)
    detections, seg_preds, times = {}, {}, []
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
            if "box3d_lidar" in out:
                m = out["mask"][i]
                detections[token] = {
                    "box3d_lidar": out["box3d_lidar"][i][m],
                    "scores": out["scores"][i][m],
                    "label_preds": out["label_preds"][i][m],
                    "metadata": meta,
                }
            if "point_seg_labels" in out:
                pm = np.asarray(batch["points_mask"][i])
                n_key = (meta or {}).get("n_key_points", int(pm.sum()))
                seg_preds[token] = {
                    "labels": out["point_seg_labels"][i][:n_key],
                    # key-frame xy for the panoptic instance fusion
                    "xy": np.asarray(batch["points"][i][:n_key, xy_cols]),
                }
            n_frames += 1
        if args.max_frames and n_frames >= args.max_frames:
            break

    third = max(1, len(times) // 3)
    window = times[third : 2 * third] or times
    fps = args.batch_size * len(window) / sum(window)
    logger.info(f"frames: {n_frames}, middle-third FPS: {fps:.2f}")

    # gather per-host results (the reference's pickle all_gather,
    # tools/dist_test.py:197-201) and evaluate on the main process
    gathered = dist.all_gather_object((detections, seg_preds))
    if not dist.is_main_process():
        return
    merged, merged_seg = {}, {}
    for d, s in gathered:
        merged.update(d)
        merged_seg.update(s)
    with open(os.path.join(args.work_dir, "prediction.pkl"), "wb") as f:
        pickle.dump(merged, f)

    # assemble the seg / panoptic evaluation inputs
    final_seg, final_ins = None, None
    if merged_seg:
        from partner_tpu.models.seg_head import panoptic_fuse

        final_seg, final_ins = {}, {}
        for token, sp in merged_seg.items():
            gt = load_seg_gt(infos_by_token.get(token, {}))
            if gt is None:
                continue
            n = min(len(gt), len(sp["labels"]))
            pred = np.asarray(sp["labels"][:n], np.int64)
            final_seg[token] = {"pred": pred, "gt": gt[:n]}
            det_out = merged.get(token)
            if det_out is not None and len(det_out["box3d_lidar"]):
                inst = panoptic_fuse(
                    pred, sp["xy"][:n],
                    det_out["box3d_lidar"], det_out["label_preds"],
                    det_out["scores"],
                    np.ones(len(det_out["scores"]), bool),
                    NUSC_THING_CLASSES, NUSC_SEMANTIC2BOX,
                )
            else:
                inst = np.zeros(n, np.int64)
            gt_inst = infos_by_token.get(token, {}).get("instance_ids")
            final_ins[token] = {
                "pred_sem": pred, "pred_inst": inst, "gt_sem": gt[:n],
                "gt_inst": (np.asarray(gt_inst[:n], np.int64)
                            if gt_inst is not None else np.zeros(n, np.int64)),
            }
        if not final_seg:
            final_seg = final_ins = None

    kwargs = {}
    if final_seg is not None:
        kwargs = dict(final_seg=final_seg, final_ins=final_ins)
    result = dataset.evaluation(merged, output_dir=args.work_dir,
                                testset=args.testset, **kwargs)
    logger.info(f"evaluation: {result}")
    return result


if __name__ == "__main__":
    main()

"""Shared evaluation engine: predict-over-val-set + metric dispatch.

The engine behind tools/dist_test.py and the trainer's mid-training
validation (reference Trainer.val, torchie/trainer/trainer.py:503-582, and
tools/dist_test.py:161-234): routes batches by the detector's declared
input contract, measures middle-third wall-clock FPS, gathers per-host
results, assembles seg/panoptic evaluation inputs, and calls
``dataset.evaluation``.
"""

import os
import pickle
import time

import numpy as np

# nuScenes lidarseg semantic ids (post 32->17 merge) for the 10 detection
# "thing" classes, mapped to NuScenesDataset.CLASSES det label indices
NUSC_THING_CLASSES = tuple(range(1, 11))
NUSC_SEMANTIC2BOX = {1: 5, 2: 7, 3: 3, 4: 0, 5: 2,
                     6: 6, 7: 8, 8: 9, 9: 4, 10: 1}


def build_predict_fn(det, cfg, kind):
    """Jitted predict closure for either input contract."""
    import jax
    import jax.numpy as jnp

    from ..ops import voxelize

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


def init_example(dataset, kind):
    """Tiny example for parameter init under the chosen contract."""
    import jax.numpy as jnp

    # + per-point extras the loader appends unconditionally (nuScenes time
    # lag), + rho, phi decoration columns from transform_points
    nf = (dataset.NumPointFeatures
          + getattr(dataset, "ExtraPointChannels", 0) + 2)
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
    from ..data.pipeline import NUSCENES_SEMANTIC_MAPPING

    path = info.get("lidarseg_path")
    if not path or not os.path.exists(path):
        return None
    raw = np.fromfile(path, dtype=np.uint8)
    return np.vectorize(NUSCENES_SEMANTIC_MAPPING.get)(raw).astype(np.int64)


def evaluate(det, cfg, dataset, variables, work_dir, logger,
             batch_size=1, max_points=200000, max_frames=None,
             input_kind=None, testset=False, predict_fn=None, mesh=None):
    """Full predict -> gather -> dataset.evaluation pass.

    Returns (result, fps) on the main process, (None, fps) elsewhere.
    With ``mesh``, eval runs mesh-sharded like training: the batch dim
    shards over 'data', params TP-shard over 'model' (the reference's
    DDP eval, tools/dist_test.py:127-135, in GSPMD form).
    """
    import jax
    import jax.numpy as jnp

    from ..data import build_dataloader
    from ..parallel import dist

    batch_put = jnp.asarray
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel.mesh import (batch_sharding, param_sharding,
                                     replicated)

        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh "
                f"data={mesh.shape['data']}")
        variables = dict(variables)
        variables["params"] = jax.tree_util.tree_map(
            jax.device_put, variables["params"],
            param_sharding(variables["params"], mesh))
        for k in variables:
            if k != "params":
                variables[k] = jax.device_put(variables[k], replicated(mesh))
        bsh = batch_sharding(mesh)
        if jax.process_count() > 1:
            # each process holds only its LOCAL rows of the global batch;
            # device_put would wrongly treat them as the full global array
            # — mirror training's shard_batch (ADVICE r4 low)
            batch_put = lambda v: jax.make_array_from_process_local_data(
                bsh, np.asarray(v))
        else:
            batch_put = lambda v: jax.device_put(np.asarray(v), bsh)

    kind = input_kind or getattr(det, "input_kind", "voxels")
    predict = predict_fn or build_predict_fn(det, cfg, kind)
    loader = build_dataloader(
        dataset, batch_size, workers_per_gpu=4, shuffle=False,
        max_points=max_points,
    )

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
            variables, batch_put(batch["points"]),
            batch_put(batch["points_mask"]),
        )
        out = jax.tree_util.tree_map(np.asarray, out)
        times.append(time.perf_counter() - t0)
        # double-flip TTA batches carry 4 point-buffer rows per example
        # [orig, yflip, xflip, xyflip]; detections come back de-flipped at
        # one row per example — index the ORIGINAL points at group stride
        group = len(batch["points"]) // max(1, len(batch["metadata"]))
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
                pm = np.asarray(batch["points_mask"][i * group])
                n_key = (meta or {}).get("n_key_points", int(pm.sum()))
                seg_preds[token] = {
                    "labels": out["point_seg_labels"][i][:n_key],
                    "xy": np.asarray(
                        batch["points"][i * group][:n_key, xy_cols]),
                }
            n_frames += 1
        if max_frames and n_frames >= max_frames:
            break

    third = max(1, len(times) // 3)
    window = times[third : 2 * third] or times
    fps = batch_size * len(window) / sum(window)
    logger.info(f"frames: {n_frames}, middle-third FPS: {fps:.2f}")

    # gather per-host results (the reference's pickle all_gather,
    # tools/dist_test.py:197-201) and evaluate on the main process
    gathered = dist.all_gather_object((detections, seg_preds))
    if not dist.is_main_process():
        return None, fps
    merged, merged_seg = {}, {}
    for d, s in gathered:
        merged.update(d)
        merged_seg.update(s)
    with open(os.path.join(work_dir, "prediction.pkl"), "wb") as f:
        pickle.dump(merged, f)

    # assemble the seg / panoptic evaluation inputs
    final_seg, final_ins = None, None
    if merged_seg:
        from ..models.seg_head import panoptic_fuse

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
    result = dataset.evaluation(merged, output_dir=work_dir,
                                testset=testset, **kwargs)
    logger.info(f"evaluation: {result}")
    return result, fps

"""Fixed-shape batch collation — the host->device contract.

Replaces collate_kitti (/root/reference/det3d/torchie/parallel/
collate.py:88-253) with a padder that emits static-shape numpy arrays the
jitted step consumes directly:

  points      (B, P_max, C) + points_mask (B, P_max)
  voxels      (B, V, K, C) + coords/num_points/voxel_mask  [hard mode only]
  hm          list per task of (B, n_az, n_r, C)  (NHWC)
  anno_box/ind/mask/cat   list per task of (B, M, ...)
  global_box  (B, M, 8|10+1) + global_box_mask
  votemap_flat (B, n_az*n_r, 4+ncls)
  metadata    python list (host side only)
"""

import numpy as np


def collate(batch_list, max_points=200000):
    ret = {}
    b = len(batch_list)
    first = batch_list[0]

    # --- points ---
    c = first["points"].shape[1]
    pts = np.zeros((b, max_points, c), np.float32)
    pmask = np.zeros((b, max_points), bool)
    for i, ex in enumerate(batch_list):
        p = ex["points"][:max_points]
        pts[i, : len(p)] = p
        pmask[i, : len(p)] = True
    ret["points"] = pts
    ret["points_mask"] = pmask

    # --- hard voxels (optional) ---
    if "voxels" in first:
        v_shape = first["voxels"].shape[1:]
        cap = max(len(ex["voxels"]) for ex in batch_list)
        voxels = np.zeros((b, cap) + v_shape, np.float32)
        coords = np.zeros((b, cap, 3), np.int32)
        nump = np.zeros((b, cap), np.int32)
        vmask = np.zeros((b, cap), bool)
        for i, ex in enumerate(batch_list):
            n = len(ex["voxels"])
            voxels[i, :n] = ex["voxels"]
            coords[i, :n] = ex["coordinates"]
            nump[i, :n] = ex["num_points"]
            vmask[i, :n] = True
        ret.update(voxels=voxels, coords=coords, num_points=nump,
                   voxel_mask=vmask)

    # --- per-task targets ---
    for key in ("hm", "anno_box", "ind", "mask", "cat"):
        if key in first:
            n_tasks = len(first[key])
            stacked = [
                np.stack([ex[key][t] for ex in batch_list])
                for t in range(n_tasks)
            ]
            if key == "hm":  # (B, C, az, r) -> NHWC
                stacked = [h.transpose(0, 2, 3, 1) for h in stacked]
            ret[key] = stacked

    if "global_box" in first:
        gb = np.stack([ex["global_box"] for ex in batch_list])
        ret["global_box"] = gb
        ret["global_box_mask"] = gb[..., -1] > 0
    if "votemap" in first:
        vm = np.stack([ex["votemap"] for ex in batch_list])
        ret["votemap_flat"] = vm.reshape(b, -1, vm.shape[-1])

    ret["metadata"] = [ex.get("metadata") for ex in batch_list]
    for key in ("grid_size", "pc_range", "voxel_size"):
        if first.get(key) is not None:
            ret[key] = np.asarray(first[key])
    return ret

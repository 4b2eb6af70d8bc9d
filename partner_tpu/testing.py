"""Shared synthetic-scene builders for tests, dry runs and benchmarks."""

import numpy as np
import jax
import jax.numpy as jnp

from .core import box_np_ops, targets
from .ops import voxelize

TINY_PR = [0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8]
TINY_GRID = (64, 128, 24)
TINY_VS = [
    (TINY_PR[3] - TINY_PR[0]) / TINY_GRID[0],
    (TINY_PR[4] - TINY_PR[1]) / TINY_GRID[1],
    (TINY_PR[5] - TINY_PR[2]) / TINY_GRID[2],
]


def tiny_model_cfg():
    """VoxelNetV3 config on the tiny grid (fast CPU compile)."""
    return dict(
        type="VoxelNetV3",
        reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=5),
        neck=dict(
            type="RPN", layer_nums=[2, 2], ds_layer_strides=[1, 2],
            ds_num_filters=[32, 64], us_layer_strides=[1, 2],
            us_num_filters=[32, 32], num_input_features=32,
            set_depth=2, set_h=2, set_w=8,
        ),
        bbox_head=dict(
            type="E2ESWVoteHead",
            in_channels=64,
            voxel_generator=dict(range=TINY_PR, voxel_size=TINY_VS),
            out_size_factor=8,
            voxel_shape="cylinder",
            SET_CRIT_CONFIG={
                "weight_dict": {"loss_ce": 1, "loss_bbox": 2,
                                "loss_vote": 0.25, "loss_vote_cls": 1,
                                "loss_iou": 2},
                "losses": ["loss_ce", "loss_bbox", "loss_vote",
                           "loss_vote_cls", "loss_iou"],
                "sigma": 3.0, "code_weights": [1.0] * 8,
            },
            CODER_CONFIG={"code_size": 7, "encode_angle_by_sincos": True},
            MATCHER_CONFIG={"weight_dict": {"loss_ce": 0.25,
                                            "loss_bbox": 0.75}},
            HEAD_CONFIG={"kernel_size": 3, "window_size": 4, "sl_depth": [2],
                         "iou_loss": True, "iou_factor": 1,
                         "init_bias": -2.19, "num_classes": 1},
        ),
    )


def synthetic_polar_scene(rng, pc_range, n_points, n_boxes=2):
    """Random boxes + on-box and background points, cylinder layout."""
    boxes = np.zeros((n_boxes, 7), np.float32)
    rho = rng.uniform(pc_range[0] + 5, pc_range[3] * 0.8, n_boxes)
    phi = rng.uniform(pc_range[1] * 0.9, pc_range[4] * 0.9, n_boxes)
    boxes[:, 0] = rho * np.cos(phi)
    boxes[:, 1] = rho * np.sin(phi)
    boxes[:, 2] = rng.uniform(-0.5, 0.5, n_boxes)
    boxes[:, 3:6] = rng.uniform(1.5, 5, (n_boxes, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)

    per_box = n_points // (2 * max(n_boxes, 1))
    chunks = []
    for bx in boxes:
        local = rng.uniform(-0.5, 0.5, (per_box, 3)) * bx[3:6]
        chunks.append(local + bx[:3])
    n_bg = n_points - per_box * n_boxes
    bg_r = rng.uniform(pc_range[0] + 0.5, pc_range[3] - 0.5, n_bg)
    bg_t = rng.uniform(pc_range[1], pc_range[4], n_bg)
    chunks.append(
        np.stack([bg_r * np.cos(bg_t), bg_r * np.sin(bg_t),
                  rng.uniform(pc_range[2], pc_range[5], n_bg)], 1)
    )
    pts = np.concatenate(chunks).astype(np.float32)
    pts = np.concatenate([pts, rng.rand(len(pts), 1).astype(np.float32)], 1)
    return boxes, box_np_ops.transform_points(pts, "cuboid")[:, :4]


def make_flagship_example(rng, grid, pc_range, voxel_size, b=2,
                          n_points=1200, cap=2048, point_dim=7,
                          max_objs=8, out_size_factor=8):
    """Fixed-shape synthetic batch for the flagship point fast path.

    The PolarDenseFHD backbone consumes raw padded points (cylinder
    layout [rho, phi, z, x, y, *extra], box_np_ops.transform_points);
    the E2E head's loss consumes ``global_box`` / ``votemap_flat``
    (reference e2e_swv_head.py:203-262 target contract)."""
    gt = np.zeros((b, max_objs, 8), np.float32)
    all_pts, all_pm, votemaps = [], [], []
    for i in range(b):
        boxes, cart = synthetic_polar_scene(rng, pc_range, n_points)
        polar = box_np_ops.transform_points(cart[:, :3], "cylinder")
        extra = cart[:, 3:]
        while polar.shape[1] + extra.shape[1] < point_dim:
            extra = np.concatenate(
                [extra, rng.rand(len(polar), 1).astype(np.float32)], 1)
        polar = np.concatenate([polar, extra], 1)[:, :point_dim]
        gt[i, : len(boxes), :7] = boxes
        gt[i, : len(boxes), 7] = 1
        pad = np.zeros((cap, point_dim), np.float32)
        m = np.zeros((cap,), bool)
        k = min(len(polar), cap)
        pad[:k] = polar[:k]
        m[:k] = True
        all_pts.append(pad)
        all_pm.append(m)
        votemaps.append(
            targets.draw_votemap(boxes, np.zeros(len(boxes)), 1, grid,
                                 voxel_size, pc_range, out_size_factor)
        )
    return {
        "points": jnp.asarray(np.stack(all_pts)),
        "points_mask": jnp.asarray(np.stack(all_pm)),
        "global_box": jnp.asarray(gt),
        "global_box_mask": jnp.asarray(gt[..., 7] > 0),
        "votemap_flat": jnp.asarray(
            np.stack(votemaps).reshape(b, -1, votemaps[0].shape[-1])
        ),
    }


def make_example(rng, b=2, n_points=3000, cap=4096, grid=None, pc_range=None,
                 voxel_size=None, max_objs=8, point_dim=5):
    """Fixed-shape synthetic training batch for the tiny detector."""
    grid = grid or TINY_GRID
    pc_range = pc_range or TINY_PR
    voxel_size = voxel_size or [
        (pc_range[3 + i] - pc_range[i]) / grid[i] for i in range(3)
    ]
    gt = np.zeros((b, max_objs, 8), np.float32)
    feats, coords, vmask, votemaps = [], [], [], []
    all_pts, all_pm = [], []
    for i in range(b):
        boxes, cart = synthetic_polar_scene(rng, pc_range, n_points)
        polar = box_np_ops.transform_points(cart[:, :3], "cylinder")
        polar = np.concatenate([polar, cart[:, 3:]], axis=1)[:, :point_dim]
        gt[i, : len(boxes), :7] = boxes
        gt[i, : len(boxes), 7] = 1

        pad = np.zeros((cap, point_dim), np.float32)
        m = np.zeros((cap,), bool)
        k = min(len(polar), cap)
        pad[:k] = polar[:k]
        m[:k] = True
        all_pts.append(pad)
        all_pm.append(m)
        vox = voxelize.dynamic_voxelize(
            jnp.asarray(pad), jnp.asarray(m),
            jnp.asarray(voxel_size, dtype=jnp.float32),
            jnp.asarray(pc_range, dtype=jnp.float32), tuple(grid),
            max_voxels=cap,
        )
        feats.append(vox["features"])
        coords.append(vox["coords"])
        vmask.append(vox["mask"])
        votemaps.append(
            targets.draw_votemap(boxes, np.zeros(len(boxes)), 1, grid,
                                 voxel_size, pc_range, 8)
        )
    ex = {
        "points": jnp.asarray(np.stack(all_pts)),
        "points_mask": jnp.asarray(np.stack(all_pm)),
        "features": jnp.stack(feats),
        "coords": jnp.stack(coords),
        "voxel_mask": jnp.stack(vmask),
        "global_box": jnp.asarray(gt),
        "global_box_mask": jnp.asarray(gt[..., 7] > 0),
        "votemap_flat": jnp.asarray(
            np.stack(votemaps).reshape(b, -1, votemaps[0].shape[-1])
        ),
    }
    return ex

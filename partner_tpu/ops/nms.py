"""Greedy rotated NMS on device (fixed shapes, jittable).

Replaces the 64-bitmask CUDA NMS of the reference
(/root/reference/det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu,
core/bbox/box_torch_ops.py:248-280 ``rotate_nms_pcdet``) with a
``lax.while_loop`` greedy loop: pick the highest-scoring live box, suppress
all boxes over the IoU threshold, repeat up to ``post_max_size`` times.

Also provides the class-offset trick for per-class NMS (the detectron2
``batched_nms_rotated`` path used by nuScenes configs, center_head.py:519).

All inputs are fixed-capacity padded arrays; invalid rows carry score -inf.
"""

import functools

import jax
import jax.numpy as jnp

from .rotated_iou import iou_bev_row

NEG_INF = -1e9


@functools.partial(jax.jit, static_argnames=("post_max_size",))
def rotated_nms(boxes, scores, iou_threshold, post_max_size):
    """Greedy rotated NMS.

    Args:
      boxes: (N, 5) [x, y, dx, dy, yaw]; padded rows must have score <= NEG_INF.
      scores: (N,)
      iou_threshold: float
      post_max_size: static K, number of outputs.

    Returns:
      keep_idx: (K,) int32 indices into the input (0 for padded slots)
      keep_mask: (K,) bool validity of each output slot
    """
    n = boxes.shape[0]

    def cond(state):
        alive_scores, keep, kmask, i = state
        return (i < post_max_size) & (jnp.max(alive_scores) > NEG_INF)

    def body(state):
        alive_scores, keep, kmask, i = state
        best = jnp.argmax(alive_scores)
        iou = iou_bev_row(boxes[best], boxes)
        suppress = iou > iou_threshold
        alive_scores = jnp.where(suppress, NEG_INF, alive_scores)
        alive_scores = alive_scores.at[best].set(NEG_INF)
        keep = keep.at[i].set(best.astype(jnp.int32))
        kmask = kmask.at[i].set(True)
        return alive_scores, keep, kmask, i + 1

    init = (
        jnp.where(jnp.isfinite(scores), scores, NEG_INF),
        jnp.zeros((post_max_size,), jnp.int32),
        jnp.zeros((post_max_size,), bool),
        jnp.int32(0),
    )
    _, keep, kmask, _ = jax.lax.while_loop(cond, body, init)
    return keep, kmask


@functools.partial(jax.jit, static_argnames=("pre_max_size", "post_max_size"))
def rotate_nms_pcdet(boxes, scores, iou_threshold, pre_max_size, post_max_size):
    """Top-k prefilter + greedy NMS; mirrors box_torch_ops.rotate_nms_pcdet.

    boxes: (N, 7) [x, y, z, dx, dy, dz, yaw] (only BEV dims used for overlap).
    Returns (keep_idx (post,), keep_mask (post,)) with indices into the input.
    """
    k = min(pre_max_size, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    bev = boxes[top_idx][:, jnp.array([0, 1, 3, 4, 6])]
    keep, kmask = rotated_nms(bev, top_scores, iou_threshold, post_max_size)
    return top_idx[keep], kmask


@functools.partial(jax.jit, static_argnames=("post_max_size",))
def batched_rotated_nms(boxes, scores, labels, iou_threshold, post_max_size):
    """Per-class rotated NMS via the coordinate-offset trick.

    Equivalent to detectron2 ``batched_nms_rotated`` (center_head.py:519):
    boxes of different classes are shifted far apart so they never overlap.
    boxes: (N, 5); labels: (N,) int.
    """
    extent = jnp.max(jnp.abs(boxes[:, :2])) + jnp.max(boxes[:, 2:4]) + 1.0
    shifted = boxes.at[:, 0].add(labels.astype(boxes.dtype) * 2 * extent)
    return rotated_nms(shifted, scores, iou_threshold, post_max_size)

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
    """Greedy rotated NMS, matrix form (the CUDA bitmask algorithm's shape).

    Sorts by score, computes the full pairwise suppression matrix in row
    chunks (one big vectorized IoU sweep instead of a 500-step sequential
    loop), then resolves the greedy recurrence with a cheap scan.

    Args:
      boxes: (N, 5) [x, y, dx, dy, yaw]; padded rows must have score <= NEG_INF.
      scores: (N,)
      iou_threshold: float
      post_max_size: static K, number of outputs.

    Returns:
      keep_idx: (K,) int32 indices into the input (0 for padded slots)
      keep_mask: (K,) bool validity of each output slot
    """
    from .rotated_iou import rect_intersection_area_green_pretrig

    n = boxes.shape[0]
    s = jnp.where(jnp.isfinite(scores), scores, NEG_INF)
    order = jnp.argsort(-s)
    b = boxes[order]
    valid = s[order] > NEG_INF / 2

    chunk = min(128, n)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    nb = n_pad // chunk
    b_pad = jnp.pad(b, ((0, n_pad - n), (0, 0)))
    # per-box precompute: the pair kernel then carries no transcendentals
    trig = jnp.stack([jnp.cos(b_pad[:, 4]), jnp.sin(b_pad[:, 4])], -1)
    area = b_pad[:, 2] * b_pad[:, 3]

    # a box is suppressed only by higher-scored (lower-index) boxes, so the
    # sweep only needs the strict upper triangle of the score-sorted pair
    # matrix: iterate the (row-block i >= col-block j) block pairs — 47%
    # less pair work than the full square at nb=16 — and write each block
    # TRANSPOSED into sup_u[suppressor j, suppressee i]
    pairs = jnp.asarray([(i, j) for i in range(nb) for j in range(i + 1)],
                        dtype=jnp.int32)
    row_ids = jnp.arange(chunk, dtype=jnp.int32)

    def one_block(sup_u, p):
        i, j = p[0], p[1]
        rows = jax.lax.dynamic_slice(b_pad, (i * chunk, 0), (chunk, 5))
        cols = jax.lax.dynamic_slice(b_pad, (j * chunk, 0), (chunk, 5))
        tr = jax.lax.dynamic_slice(trig, (i * chunk, 0), (chunk, 2))
        tc = jax.lax.dynamic_slice(trig, (j * chunk, 0), (chunk, 2))
        ra = jax.lax.dynamic_slice(area, (i * chunk,), (chunk,))
        rc = jax.lax.dynamic_slice(area, (j * chunk,), (chunk,))
        inter = rect_intersection_area_green_pretrig(
            rows[:, None, :], cols[None, :, :], tr[:, None, :], tc[None, :, :]
        )
        union = jnp.maximum(ra[:, None] + rc[None, :] - inter, 1e-8)
        blk = inter / union > iou_threshold
        # strict global j < i (masks the diagonal block's lower half + self)
        blk &= (j * chunk + row_ids)[None, :] < (i * chunk + row_ids)[:, None]
        sup_u = jax.lax.dynamic_update_slice(sup_u, blk.T,
                                             (j * chunk, i * chunk))
        return sup_u, None

    sup_u = jnp.zeros((n_pad, n_pad), bool)
    sup_u, _ = jax.lax.scan(one_block, sup_u, pairs)
    sup_u = sup_u[:n, :n] & valid[:, None] & valid[None, :]

    kept = _greedy_keep_upper(sup_u, valid)

    # kept-first stable ordering preserves score order among the kept
    pick = jnp.argsort(~kept, stable=True)[:post_max_size]
    return order[pick].astype(jnp.int32), kept[pick]


def _greedy_keep(suppress_mat, valid):
    """Resolve the greedy NMS recurrence over a score-sorted suppression
    matrix as a Jacobi fixpoint instead of an n-step scan:

      kept[i] = valid[i] & no kept higher-score box suppresses i

    Each sweep fixes at least one more suppression-chain layer, so it
    converges to exactly the sequential greedy solution in chain-depth
    iterations (typically < 20) — each sweep is one masked matvec
    instead of n sequential scan steps."""
    n = suppress_mat.shape[0]
    col = jnp.arange(n)
    upper = col[:, None] < col[None, :]  # j suppresses i only if j < i
    return _greedy_keep_upper(suppress_mat & upper, valid)


def _greedy_keep_upper(sup_u, valid):
    """:func:`_greedy_keep` for a matrix already strictly upper-triangular
    (sup_u[j, i] == True only for j < i)."""
    n = sup_u.shape[0]

    def cond(state):
        kept, prev, it = state
        return (it < n) & jnp.any(kept != prev)

    def body(state):
        kept, _, it = state
        new = valid & ~jnp.any(sup_u & kept[:, None], axis=0)
        return new, kept, it + 1

    kept, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros((n,), bool), jnp.int32(0)))
    return kept


@functools.partial(jax.jit, static_argnames=("post_max_size",))
def circle_nms(centers, scores, min_radius, post_max_size):
    """Greedy center-distance NMS — the reference's numba circle-NMS
    (/root/reference/det3d/core/utils/circle_nms_jit.py, wrapped at
    core/utils/center_utils.py:82-91): suppress any lower-scored box whose
    center lies too close to a kept box's center.

    NOTE on units (matches the reference kernel exactly): the reference
    compares SQUARED distance against the UN-squared threshold
    (``dist = dx**2 + dy**2; if dist <= thresh``, circle_nms_jit.py:97-101),
    so ``min_radius`` is in squared-meters — the effective radius is
    ``sqrt(min_radius)``. Reference-tuned config values (e.g. nuScenes
    min_radius=[4,12,10,1,0.85,0.175]) rely on this.

    centers: (N, 2); padded rows must carry score <= NEG_INF.
    Returns (keep_idx (K,), keep_mask (K,))."""
    n = centers.shape[0]
    s = jnp.where(jnp.isfinite(scores), scores, NEG_INF)
    order = jnp.argsort(-s)
    c = centers[order]
    valid = s[order] > NEG_INF / 2

    d2 = jnp.sum((c[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    suppress_mat = (d2 <= min_radius) & valid[:, None] & valid[None, :]
    kept = _greedy_keep(suppress_mat, valid)
    pick = jnp.argsort(~kept, stable=True)[:post_max_size]
    return order[pick].astype(jnp.int32), kept[pick]


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

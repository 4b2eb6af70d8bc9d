"""Segmentation heads + lovasz loss + panoptic fusion.

flax/jnp re-implementation of
/root/reference/det3d/models/seg_heads/seg_head.py:52-264 and
losses/{seg_loss.py, lovasz_losses.py}:

- SingleConvHead: upsample RPN features to the voxel canvas resolution,
  concat, 1 conv -> per-cell class logits
- DeconvConvHead: Shelhamer transpose-conv upsampling with
  height-as-channels 3D output (z x classes channels)
- SegLoss = cross-entropy + lovasz softmax
- point labels looked up at per-point grid indices; panoptic fusion assigns
  instance ids by nearest detected box center (seg_head.py:99-168)
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .registry import SEG_HEADS


@SEG_HEADS.register_module(name="SingleConvHead")
class SingleConvHead(nn.Module):
    num_classes: int = 16
    kernel: int = 1
    weight: float = 1.0

    @nn.compact
    def __call__(self, canvas, rpn_feat, train: bool = True):
        """canvas (B, H, W, C1) full-res; rpn_feat (B, h, w, C2)."""
        b, h, w, _ = canvas.shape
        up = jax.image.resize(
            rpn_feat, (b, h, w, rpn_feat.shape[-1]), method="bilinear"
        )
        x = jnp.concatenate([canvas, up], axis=-1)
        k = (self.kernel, self.kernel)
        return {"seg_preds": nn.Conv(self.num_classes, k,
                                     padding=self.kernel // 2)(x)}


@SEG_HEADS.register_module(name="DeconvConvHead")
class DeconvConvHead(nn.Module):
    """Transpose-conv upsample + height-as-channels 3D logits."""

    num_classes: int = 16
    kernel: int = 1
    in_channels: int = 512
    up_scale: int = 8
    height: int = 1
    weight: float = 1.0

    @nn.compact
    def __call__(self, canvas, rpn_feat, train: bool = True):
        """canvas (B, D, H, W, C1) voxel features or (B, H, W, C1) BEV;
        rpn_feat (B, h, w, C2).

        The reference deconvolves the stride-8 RPN features back to the
        full voxel grid (seg_head.py:195-264); here the label grid is
        whatever canvas the backbone exposes (quarter-res for the dense
        TPU backbone), so the upsampled features are resized to the
        canvas resolution when the deconv stride does not land exactly."""
        deconv_ch = (
            self.in_channels // self.up_scale if self.height == 1
            else self.height
        )
        s = self.up_scale
        up = nn.ConvTranspose(
            deconv_ch, (2 * s, 2 * s), strides=(s, s), padding=s,
            use_bias=False,
        )(rpn_feat)
        hw = canvas.shape[2:4] if canvas.ndim == 5 else canvas.shape[1:3]
        if up.shape[1:3] != tuple(hw):
            up = jax.image.resize(
                up, (up.shape[0], hw[0], hw[1], up.shape[-1]),
                method="bilinear")
        if canvas.ndim == 5:
            b, d, h, w, c1 = canvas.shape
            flat = canvas.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c1)
            x = jnp.concatenate([flat, up], axis=-1)
            k = (self.kernel, self.kernel)
            y = nn.Conv(self.num_classes * d, k,
                        padding=self.kernel // 2)(x)
            y = y.reshape(b, h, w, d, self.num_classes).transpose(0, 3, 1, 2, 4)
            return {"seg_preds": y}  # (B, D, H, W, ncls)
        x = jnp.concatenate([canvas, up], axis=-1)
        k = (self.kernel, self.kernel)
        return {"seg_preds": nn.Conv(self.num_classes, k,
                                     padding=self.kernel // 2)(x)}


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def cross_entropy_ignore(logits, labels, ignore=-1):
    """Mean CE over cells whose label != ignore (labels are 1-based with 0
    = empty in the voxel-label maps; callers shift as needed)."""
    valid = labels != ignore
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)


def lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (lovasz_losses.py:24-38)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-9)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax_flat(probs, labels, valid):
    """Multi-class lovasz-softmax over flattened cells.

    probs (N, C) softmax probabilities; labels (N,) int; valid (N,) bool.
    Fixed-shape variant: invalid cells get zero error and sort to the end.
    """
    n, c = probs.shape
    losses = []
    for cls in range(c):
        fg = ((labels == cls) & valid).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, cls]) * valid
        order = jnp.argsort(-errors)
        e_sorted = errors[order]
        fg_sorted = fg[order]
        grad = lovasz_grad(fg_sorted)
        has_cls = fg.sum() > 0
        losses.append(jnp.where(has_cls, jnp.dot(e_sorted, grad), 0.0))
    present = jnp.stack([
        (((labels == cls) & valid).sum() > 0) for cls in range(c)
    ])
    total = jnp.stack(losses).sum()
    return total / jnp.maximum(present.sum(), 1)


def seg_loss(seg_preds, voxel_labels, ignore=-1, weight=1.0):
    """SegLoss = CE + lovasz (losses/seg_loss.py:8-40).

    seg_preds (B, [D,] H, W, C); voxel_labels same spatial shape, int
    (0 = unlabeled -> ignored, labels are 1-based).
    """
    labels = voxel_labels.astype(jnp.int32) - 1  # -1 = ignore
    logits = seg_preds.reshape(-1, seg_preds.shape[-1])
    flat_labels = labels.reshape(-1)
    valid = flat_labels >= 0
    ce = cross_entropy_ignore(logits, flat_labels, ignore=-1)
    lv = lovasz_softmax_flat(
        jax.nn.softmax(logits, axis=-1), flat_labels, valid
    )
    return weight * (ce + lv)


def points_to_grid_cells(points, mask, out_shape, pc_range,
                         voxel_shape="cylinder"):
    """Per-point seg-grid indices for an (D, H, W) or (H, W) label grid.

    Grid convention matches the BEV canvas everywhere in this framework:
    rows (H) = azimuth/y, cols (W) = range/x (pillar.py:pp_scatter).
    points (B, P, C): cylinder layout [rho, phi, z, ...] or cuboid
    [x, y, z, ...]. Returns grid_ind (B, P, 3) int32 as (z, row, col)
    (z = 0 for 2D grids) and ok (B, P) validity."""
    if len(out_shape) == 3:
        d, h, w = (int(s) for s in out_shape)
    else:
        d = 1
        h, w = (int(s) for s in out_shape)
    pr = jnp.asarray(pc_range, jnp.float32)
    # cylinder: c0 = rho -> col, c1 = phi -> row; cuboid: x -> col, y -> row
    col = jnp.floor((points[..., 0] - pr[0]) / ((pr[3] - pr[0]) / w))
    row = jnp.floor((points[..., 1] - pr[1]) / ((pr[4] - pr[1]) / h))
    zi = jnp.floor((points[..., 2] - pr[2]) / ((pr[5] - pr[2]) / d))
    gi = jnp.stack([zi, row, col], -1).astype(jnp.int32)
    ok = mask & jnp.all(
        (gi >= 0) & (gi < jnp.asarray([d, h, w], jnp.int32)), -1)
    return gi, ok


def majority_grid_labels(grid_ind, ok, point_labels, out_shape, n_classes):
    """Per-cell majority semantic label over an (D, H, W) or (H, W) grid
    (device analog of the reference's numba voxel majority-label assigner,
    /root/reference/det3d/datasets/pipelines/preprocess.py:170-191).

    Labels are 1-based; 0 = unlabeled. Returns (B, [D,] H, W) int32."""
    if len(out_shape) == 3:
        d, h, w = (int(s) for s in out_shape)
    else:
        d = 1
        h, w = (int(s) for s in out_shape)
    cells = d * h * w

    def one(gi, m, lab):
        lin = (gi[:, 0] * h + gi[:, 1]) * w + gi[:, 2]
        lin = jnp.where(m & (lab > 0), lin, cells)
        onehot_idx = lin * (n_classes + 1) + jnp.clip(lab, 0, n_classes)
        counts = jnp.zeros(((cells + 1) * (n_classes + 1),), jnp.int32
                           ).at[onehot_idx].add(1, mode="drop")
        counts = counts[: cells * (n_classes + 1)].reshape(
            cells, n_classes + 1)
        counts = counts.at[:, 0].set(0)
        maj = jnp.argmax(counts, axis=-1)
        maj = jnp.where(counts.sum(-1) > 0, maj, 0)
        out = maj.reshape(d, h, w)
        return out[0] if len(out_shape) == 2 else out

    return jax.vmap(one)(grid_ind, ok, point_labels)


def point_labels_from_grid(seg_preds, grid_ind):
    """Per-point predicted labels: lookup cells at (B, P, 3) grid indices.

    seg_preds (B, D, H, W, C) or (B, H, W, C); returns (B, P) 1-based labels
    (seg_head.py:171-193 semantics).
    """
    cls = jnp.argmax(seg_preds, axis=-1) + 1

    def one(c, gi):
        if c.ndim == 3:  # (D, H, W)
            return c[gi[:, 0], gi[:, 1], gi[:, 2]]
        return c[gi[:, 1], gi[:, 2]]

    return jax.vmap(one)(cls, grid_ind)


def panoptic_fuse(point_labels, points_xy, det_boxes, det_labels, det_scores,
                  det_mask, thing_classes, semantic2box, score_th=0.3):
    """Nearest-box-center instance assignment for thing points.

    Host-side numpy (runs on eval outputs), mirroring seg_head.py:99-168.
    """
    import numpy as np

    inst = np.zeros(len(point_labels), dtype=np.int64)
    boxes = np.asarray(det_boxes)[np.asarray(det_mask)]
    labels = np.asarray(det_labels)[np.asarray(det_mask)]
    scores = np.asarray(det_scores)[np.asarray(det_mask)]
    for cls in thing_classes:
        pts_idx = np.flatnonzero(point_labels == cls)
        if not len(pts_idx):
            continue
        box_label = semantic2box.get(cls)
        m = (labels == box_label) & (scores > score_th)
        if not m.any():
            continue
        centers = boxes[m][:, :2]
        ids = np.flatnonzero(m) + 1
        d = np.linalg.norm(
            points_xy[pts_idx][:, None, :] - centers[None], axis=-1
        )
        inst[pts_idx] = ids[np.argmin(d, axis=1)]
    return inst

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
        """canvas (B, D, H, W, C1) voxel features; rpn_feat (B, h, w, C2)."""
        deconv_ch = (
            self.in_channels // self.up_scale if self.height == 1
            else self.height
        )
        s = self.up_scale
        up = nn.ConvTranspose(
            deconv_ch, (2 * s, 2 * s), strides=(s, s), padding=s,
            use_bias=False,
        )(rpn_feat)
        if canvas.ndim == 5:
            b, d, h, w, c1 = canvas.shape
            flat = canvas.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c1)
            x = jnp.concatenate([flat, up[:, :h, :w]], axis=-1)
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

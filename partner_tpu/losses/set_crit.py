"""SetCriterion: Hungarian-matched losses for the E2E vote head.

jnp re-implementation of /root/reference/det3d/models/e2e_utils/
set_crit.py:30-206 over fixed-shape padded gt buffers:

  loss_ce       sigmoid focal over ALL queries, one-hot targets at matched
                queries, / num_boxes
  loss_bbox     smooth-L1 on code-weighted coder deltas of matched pairs,
                / num_boxes
  loss_vote     smooth-L1 of predicted center offsets vs votemap centers at
                cells where votemap[..., 0] != 0, / vote_num
  loss_vote_cls sigmoid focal of the vote objectness map vs votemap class
                gaussians, / vote_num
  loss_iou      smooth-L1 of predicted IoU vs (2 * IoU3D(dec(pred), gt) - 1),
                / num_boxes

num_boxes is all-reduced over the data-parallel axis when ``axis_name`` is
given (reference set_crit.py:117-121).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.center_coder import CenterCoder
from ..ops.rotated_iou import boxes_iou3d
from .centernet import sigmoid_focal_loss, smooth_l1
from .matcher import assign_auction, assign_scipy


class SetCriterion:
    def __init__(self, box_coder: CenterCoder, weight_dict, losses, sigma=3.0,
                 code_weights=(1.0,) * 8, gamma=2.0, alpha=0.25,
                 matcher_weights=None, matcher_impl="auction",
                 iou_reg_type="DIoU",
                 axis_name: Optional[str] = None):
        self.iou_reg_type = iou_reg_type
        self.coder = box_coder
        self.weight_dict = weight_dict
        self.losses = losses
        self.sigma = sigma
        self.code_weights = jnp.asarray(code_weights)
        self.gamma = gamma
        self.alpha = alpha
        mw = matcher_weights or {"loss_ce": 0.25, "loss_bbox": 0.75}
        self.w_ce = mw["loss_ce"]
        self.w_bbox = mw["loss_bbox"]
        self.matcher_impl = matcher_impl
        self.axis_name = axis_name

    def __call__(self, preds, gt_boxes, gt_classes, gt_mask, votemap=None):
        """
        preds: dict with
          pred_logits (B, N, ncls), pred_boxes (B, N, code) (absolute-xy
          encoded space), pred_centers (B, N, 2) absolute cartesian,
          pred_vote_cls (B, N, 1), optional pred_ious (B, N, 1)
        gt_boxes: (B, M, 7) raw; gt_classes: (B, M) 0-based; gt_mask (B, M)
        votemap: (B, N, 4 + ncls) flattened host-precomputed vote targets
        """
        logits = preds["pred_logits"]
        b, n, ncls = logits.shape
        gt_enc = self.coder.encode(gt_boxes)  # (B, M, code)

        if self.matcher_impl == "scipy":
            assigned = assign_scipy(
                logits, preds["pred_boxes"], gt_classes, gt_enc, gt_mask,
                self.code_weights,
            )
        else:
            assigned = jax.lax.stop_gradient(
                assign_auction(
                    logits, preds["pred_boxes"], gt_classes, gt_enc, gt_mask,
                    self.code_weights,
                )
            )
        matched = (assigned >= 0) & gt_mask  # (B, M)
        safe_idx = jnp.maximum(assigned, 0)

        num_boxes = gt_mask.sum().astype(jnp.float32)
        if self.axis_name is not None:
            num_boxes = jax.lax.pmean(num_boxes, self.axis_name)
        num_boxes = jnp.maximum(num_boxes, 1.0)

        out = {}

        # --- loss_bbox ---
        pred_matched = jnp.take_along_axis(
            preds["pred_boxes"], safe_idx[..., None], axis=1
        )  # (B, M, code)
        delta = self.coder.get_delta(gt_boxes, pred_matched)
        delta = delta * self.code_weights
        lb = smooth_l1(delta, self.sigma) * matched[..., None]
        out["loss_bbox"] = lb.sum() / num_boxes

        # --- loss_ce ---
        one_hot = jax.nn.one_hot(gt_classes, ncls) * matched[..., None]
        target = jnp.zeros((b, n, ncls)).at[
            jnp.arange(b)[:, None], safe_idx, :
        ].add(one_hot)
        # coincident matches could stack; clamp to a valid one-hot
        target = jnp.clip(target, 0.0, 1.0)
        out["loss_ce"] = (
            sigmoid_focal_loss(logits, target, self.gamma, self.alpha)
            / num_boxes
        )

        # --- vote losses ---
        if votemap is not None and "pred_centers" in preds:
            votemask = votemap[..., 0] != 0  # (B, N)
            vote_num = jnp.maximum(votemask.sum().astype(jnp.float32), 1.0)
            vdelta = (preds["pred_centers"] - votemap[..., :2]) * votemask[..., None]
            out["loss_vote"] = smooth_l1(vdelta, self.sigma).sum() / vote_num
            out["loss_vote_cls"] = (
                sigmoid_focal_loss(
                    preds["pred_vote_cls"], votemap[..., 4:], self.gamma,
                    self.alpha,
                )
                / vote_num
            )

        # --- loss_iou ---
        if "pred_ious" in preds and "loss_iou" in self.losses:
            dec = _safe_dims(self.coder.decode(pred_matched)[..., :7])
            t_iou = jax.lax.stop_gradient(boxes_iou3d(dec, gt_boxes[..., :7]))
            t_iou = jnp.nan_to_num(t_iou) * 2.0 - 1.0
            p_iou = jnp.take_along_axis(
                preds["pred_ious"][..., 0], safe_idx, axis=1
            )
            li = smooth_l1_torch(p_iou - t_iou) * matched
            out["loss_iou"] = li.sum() / num_boxes

        # --- loss_iou_reg (DIoU box regression, set_crit.py:187-190) ---
        if "loss_iou_reg" in self.losses:
            from .iou_losses import iou_reg_loss

            dec = _safe_dims(self.coder.decode(pred_matched)[..., :7])
            out["loss_iou_reg"] = iou_reg_loss(
                dec, gt_boxes[..., :7], self.iou_reg_type, mask=matched
            ) / num_boxes

        total = sum(
            out[k] * self.weight_dict[k] for k in out if k in self.weight_dict
        )
        out["loss"] = total
        out["num_matched"] = matched.sum()
        return out


def _safe_dims(boxes):
    """Floor-clamp decoded dims before the IoU losses: CenterCoderTP's
    linear dim decode has no clamp (matching the reference), so early in
    training preds + template can be <= 0 and the DIoU/iou3d volume math
    emits NaN gradients (ADVICE r4 low: loss_iou nan_to_nums only the
    TARGET; loss_iou_reg has nothing)."""
    dims = jnp.maximum(boxes[..., 3:6], 1e-5)
    return jnp.concatenate([boxes[..., :3], dims, boxes[..., 6:]], axis=-1)


def smooth_l1_torch(x, beta=1.0):
    """torch.nn.SmoothL1Loss default (beta=1), used by IOULoss
    (loss_utils.py:583-594)."""
    absx = jnp.abs(x)
    return jnp.where(absx < beta, 0.5 * x * x / beta, absx - 0.5 * beta)

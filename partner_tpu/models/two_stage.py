"""Two-stage detector: BEV-feature RoI refinement (CenterPoint-style).

Re-engineers /root/reference/det3d/models/detectors/two_stage.py:9-193 +
second_stage/bird_eye_view.py:10-60 + roi_heads/roi_head.py:

  first stage (VoxelNet + CenterHead) -> proposals
  -> 5 sample points per box (center + 4 side midpoints)
  -> bilinear BEV feature interpolation at each point
  -> shared MLP RoI head -> IoU confidence + box residual refinement.

TPU form: fixed-size proposal buffers, bilinear sampling via
map_coordinates on the polar NHWC neck map, jittable IoU-matched targets
(no CPU ProposalTargetLayer sampling loop).
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotated_iou import rect_intersection_area_green
from .detectors import (CenterPointDetector, Detector, VoxelNetModule,
                        _grid_spec)
from .registry import BACKBONES, BBOX_HEADS, DETECTORS, NECKS, READERS


def box_sample_points(boxes):
    """(..., 7+) boxes -> (..., 5, 3) sample points: center + 4 side
    midpoints at box height (two_stage.py:56-72)."""
    cx, cy, cz = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    dx, dy = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., -1]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # local side-midpoint offsets (+-dx/2, 0) and (0, +-dy/2)
    offs = jnp.stack([
        jnp.zeros_like(dx), jnp.zeros_like(dx),
        dx / 2, jnp.zeros_like(dx),
        -dx / 2, jnp.zeros_like(dx),
        jnp.zeros_like(dx), dy / 2,
        jnp.zeros_like(dx), -dy / 2,
    ], axis=-1).reshape(boxes.shape[:-1] + (5, 2))
    ox = offs[..., 0] * c[..., None] - offs[..., 1] * s[..., None]
    oy = offs[..., 0] * s[..., None] + offs[..., 1] * c[..., None]
    px = cx[..., None] + ox
    py = cy[..., None] + oy
    pz = jnp.broadcast_to(cz[..., None], px.shape)
    return jnp.stack([px, py, pz], axis=-1)


def bev_bilinear_sample(bev, pts_xy, pc_range, out_stride, grid_size,
                        voxel_shape="cylinder"):
    """Bilinear BEV features at cartesian points.

    bev: (n_az, n_r, C) NHWC neck map; pts_xy: (M, 2). Equivalent of
    bilinear_interpolate_torch on the polar grid (bird_eye_view.py:24-41).
    """
    n_az, n_r, c = bev.shape
    if voxel_shape == "cylinder":
        rho = jnp.hypot(pts_xy[..., 0], pts_xy[..., 1])
        phi = jnp.arctan2(pts_xy[..., 1], pts_xy[..., 0])
        a = (rho - pc_range[0]) / (pc_range[3] - pc_range[0]) * n_r - 0.5
        b = (phi - pc_range[1]) / (pc_range[4] - pc_range[1]) * n_az - 0.5
    else:
        a = (pts_xy[..., 0] - pc_range[0]) / (
            pc_range[3] - pc_range[0]) * n_r - 0.5
        b = (pts_xy[..., 1] - pc_range[1]) / (
            pc_range[4] - pc_range[1]) * n_az - 0.5
    coords = jnp.stack([
        jnp.broadcast_to(b[..., None], b.shape + (c,)),
        jnp.broadcast_to(a[..., None], a.shape + (c,)),
        jnp.broadcast_to(jnp.arange(c, dtype=jnp.float32), b.shape + (c,)),
    ])
    return jax.scipy.ndimage.map_coordinates(
        bev, coords, order=1, mode="constant", cval=0.0)


class RoIHead(nn.Module):
    """Shared-MLP RoI head: per-proposal features -> IoU conf + residuals
    (roi_heads/roi_head.py with fc_list semantics)."""

    fc_channels: Sequence[int] = (256, 256)
    code_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = True):
        for f in self.fc_channels:
            x = nn.Dense(f)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        iou = nn.Dense(1, name="cls_out")(x)
        reg = nn.Dense(self.code_size, name="reg_out")(x)
        return iou[..., 0], reg


class TwoStageModule(nn.Module):
    """First-stage VoxelNetModule + RoI refinement head."""

    first: VoxelNetModule
    roi_fc: Tuple[int, ...] = (256, 256)
    num_point: int = 5
    voxel_shape: str = "cylinder"

    def setup(self):
        self.roi_head = RoIHead(fc_channels=self.roi_fc)

    def __call__(self, example, train: bool = True):
        return self.first(example, train=train, return_bev=True)

    def init_all(self, example):
        """Traces both stages so init creates every parameter."""
        preds, bev = self.first(example, train=False, return_bev=True)
        b = bev.shape[0]
        self.refine(bev, jnp.zeros((b, 1, 7)), jnp.zeros((b, 1)), False)
        return preds

    def refine(self, bev, boxes, scores, train: bool = True):
        """bev (B, n_az, n_r, C); boxes (B, N, 7+); scores (B, N)."""
        pts = box_sample_points(boxes)  # (B, N, 5, 3)
        pc_range = self.first.pc_range
        osf = self.first.out_size_factor
        grid = self.first.grid_size

        def one(bmap, p):
            return bev_bilinear_sample(bmap, p.reshape(-1, 3)[:, :2],
                                       pc_range, osf, grid,
                                       voxel_shape=self.voxel_shape)

        feats = jax.vmap(one)(bev, pts)  # (B, N*5, C)
        b, n = boxes.shape[:2]
        feats = feats.reshape(b, n, self.num_point * bev.shape[-1])
        x = jnp.concatenate([feats, scores[..., None]], axis=-1)
        return self.roi_head(x, train)


def _bev5(boxes):
    return jnp.stack([boxes[..., 0], boxes[..., 1], boxes[..., 3],
                      boxes[..., 4], boxes[..., -1]], axis=-1)


def proposal_targets(proposals, gt_boxes, gt_mask):
    """Jittable RoI target assignment (ProposalTargetLayer equivalent).

    proposals (N, 7), gt_boxes (M, 8) [box7, class], gt_mask (M,).
    Returns (iou_target (N,), reg_target (N, 7), pos_mask (N,)).
    iou target follows CenterPoint's rcnn label: clamp(2*iou - 0.5, 0, 1).
    """
    gb = gt_boxes[:, :7]
    pb = _bev5(proposals)
    g5 = _bev5(gb)
    inter = rect_intersection_area_green(
        jnp.broadcast_to(pb[:, None, :], (pb.shape[0], g5.shape[0], 5)),
        jnp.broadcast_to(g5[None, :, :], (pb.shape[0], g5.shape[0], 5)))
    area_p = pb[:, 2] * pb[:, 3]
    area_g = g5[:, 2] * g5[:, 3]
    iou = inter / jnp.maximum(area_p[:, None] + area_g[None] - inter, 1e-6)
    iou = jnp.where(gt_mask[None, :], iou, 0.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    m = gb[best]

    # residual encoding relative to the proposal (PointRCNN-style)
    d = jnp.maximum(jnp.hypot(proposals[:, 3], proposals[:, 4]), 1e-3)
    tx = (m[:, 0] - proposals[:, 0]) / d
    ty = (m[:, 1] - proposals[:, 1]) / d
    tz = (m[:, 2] - proposals[:, 2]) / jnp.maximum(proposals[:, 5], 1e-3)
    tdx = jnp.log(jnp.maximum(m[:, 3], 1e-3)
                  / jnp.maximum(proposals[:, 3], 1e-3))
    tdy = jnp.log(jnp.maximum(m[:, 4], 1e-3)
                  / jnp.maximum(proposals[:, 4], 1e-3))
    tdz = jnp.log(jnp.maximum(m[:, 5], 1e-3)
                  / jnp.maximum(proposals[:, 5], 1e-3))
    dyaw = m[:, 6] - proposals[:, 6]
    dyaw = (dyaw + jnp.pi) % (2 * jnp.pi) - jnp.pi
    reg = jnp.stack([tx, ty, tz, tdx, tdy, tdz, dyaw], axis=-1)

    iou_t = jnp.clip(2.0 * best_iou - 0.5, 0.0, 1.0)
    pos = best_iou > 0.55
    return iou_t, reg, pos


def apply_residuals(proposals, reg):
    """Inverse of the residual encoding."""
    d = jnp.maximum(jnp.hypot(proposals[..., 3], proposals[..., 4]), 1e-3)
    x = proposals[..., 0] + reg[..., 0] * d
    y = proposals[..., 1] + reg[..., 1] * d
    z = proposals[..., 2] + reg[..., 2] * jnp.maximum(proposals[..., 5],
                                                      1e-3)
    dx = proposals[..., 3] * jnp.exp(reg[..., 3])
    dy = proposals[..., 4] * jnp.exp(reg[..., 4])
    dz = proposals[..., 5] * jnp.exp(reg[..., 5])
    yaw = proposals[..., 6] + reg[..., 6]
    return jnp.stack([x, y, z, dx, dy, dz, yaw], axis=-1)


class TwoStageDetector(Detector):
    """Driver: joint first-stage + RoI loss; refined predict."""

    def __init__(self, module, first_driver, test_cfg=None,
                 num_proposals_train=128, roi_weight=1.0, freeze=False):
        super().__init__(module, test_cfg)
        self.first_driver = first_driver
        self.num_proposals_train = num_proposals_train
        self.roi_weight = roi_weight
        # freeze = fine-tune the RoI head only (the reference's
        # *_ft_6epoch_freeze configs, two_stage.py:freeze kwarg): the
        # first-stage loss is dropped and no gradient flows into the BEV
        self.freeze = freeze

    def init(self, rng, example):
        import functools

        return jax.jit(functools.partial(
            self.module.init, method=TwoStageModule.init_all))(rng, example)

    def loss(self, variables, example, rng=None, train=True):
        from .center_head import center_head_decode, center_head_loss

        rngs = {"dropout": rng} if rng is not None else None
        (preds, bev), updates = self.module.apply(
            variables, example, train=train, rngs=rngs,
            mutable=["batch_stats"] if train else [])
        fd = self.first_driver
        if self.freeze:
            preds = jax.lax.stop_gradient(preds)
            bev = jax.lax.stop_gradient(bev)
            ld = {"loss": 0.0}
        else:
            ld = center_head_loss(preds, example, fd.code_weights,
                                  fd.weight, fd.dataset)

        # proposals: top-K decoded first-stage boxes (no NMS at train)
        task = preds["det_preds"][0]
        hm = task["hm"]
        boxes, scores = center_head_decode(
            task, (hm.shape[1], hm.shape[2]), fd.voxel_size,
            self.module.first.pc_range, self.module.first.out_size_factor,
            voxel_shape=fd.voxel_shape)
        cls_score = scores.max(-1)
        k = min(self.num_proposals_train, boxes.shape[1])
        top_s, top_i = jax.lax.top_k(cls_score, k)
        props = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
        props = jnp.concatenate([props[..., :6], props[..., -1:]], -1)
        props = jax.lax.stop_gradient(props)
        top_s = jax.lax.stop_gradient(top_s)

        iou_pred, reg_pred = self.module.apply(
            variables, bev, props, top_s, train,
            method=TwoStageModule.refine,
            rngs=rngs, mutable=False)

        gt = example["global_box"]
        gt_mask = example["global_box_mask"]
        gt7c = jnp.concatenate([gt[..., :6], gt[..., -2:]], axis=-1)

        iou_t, reg_t, pos = jax.vmap(proposal_targets)(props, gt7c, gt_mask)
        cls_loss = jnp.mean(
            (jax.nn.sigmoid(iou_pred) - iou_t) ** 2)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        reg_loss = (jnp.abs(reg_pred - reg_t).sum(-1) * pos).sum() / n_pos
        roi = cls_loss + reg_loss
        ld["roi_cls_loss"] = cls_loss
        ld["roi_reg_loss"] = reg_loss
        ld["loss"] = ld["loss"] + self.roi_weight * roi
        return ld, updates

    def predict(self, variables, example):
        from .center_head import center_head_post_process, center_head_decode

        preds, bev = self.module.apply(variables, example, train=False)
        fd = self.first_driver
        task = preds["det_preds"][0]
        hm = task["hm"]
        boxes, scores = center_head_decode(
            task, (hm.shape[1], hm.shape[2]), fd.voxel_size,
            self.module.first.pc_range, self.module.first.out_size_factor,
            voxel_shape=fd.voxel_shape,
            rectify=self.test_cfg.get("rectify", False))
        out = center_head_post_process(boxes, scores, self.test_cfg)

        props = out["box3d_lidar"]
        props7 = jnp.concatenate([props[..., :6], props[..., -1:]], -1)
        iou_pred, reg_pred = self.module.apply(
            variables, bev, props7, out["scores"], False,
            method=TwoStageModule.refine)
        refined = apply_residuals(props7, reg_pred)
        iou = jnp.clip(jax.nn.sigmoid(iou_pred), 1e-4, 1.0)
        # CenterPoint two-stage confidence: geometric mean of stage scores
        out["scores"] = jnp.sqrt(jnp.maximum(out["scores"], 0.0) * iou) \
            * out["mask"]
        if props.shape[-1] > 7:
            refined = jnp.concatenate(
                [refined[..., :6], props[..., 6:-1], refined[..., -1:]], -1)
        out["box3d_lidar"] = refined
        return out


@DETECTORS.register_module(name="TwoStageDetector")
def build_two_stage(first_stage_cfg, roi_head=None, second_stage_modules=None,
                    NMS_POST_MAXSIZE=500, num_point=5, freeze=False,
                    pretrained=None, train_cfg=None, test_cfg=None, **kwargs):
    from .registry import build_from_cfg as _build
    from . import build_detector

    first = build_detector(dict(first_stage_cfg), train_cfg, test_cfg)
    assert isinstance(first, CenterPointDetector), (
        "two-stage wraps a CenterPoint-style first stage")
    roi_cfg = dict(roi_head or {})
    # accept both the compact {fc: [...]} form and the reference's nested
    # model_cfg.SHARED_FC (two_stage config contract)
    fc = roi_cfg.get("fc")
    if fc is None:
        fc = dict(roi_cfg.get("model_cfg", {})).get("SHARED_FC", (256, 256))
    module = TwoStageModule(
        first=first.module,
        roi_fc=tuple(fc),
        num_point=num_point,
        voxel_shape=first.voxel_shape,
    )
    return TwoStageDetector(module, first, test_cfg=dict(test_cfg or {}),
                            freeze=freeze)

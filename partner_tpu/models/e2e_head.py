"""E2ESWVoteHead — PARTNER's instance-aware geometric detection head.

Re-implements the *intended* head of
/root/reference/det3d/models/bbox_heads/e2e_swv_head.py:22-476 (the shipped
constructor is dead on arrival — see SURVEY.md section 0). Maps are NHWC
(B, H=azimuth, W=range, C).

Pipeline (forward, e2e_swv_head.py:152-173):
  votes = vote_head(x)           2-ch cartesian center offsets
  vote_cls = vote_cls_head(x)    1-ch objectness
  feat = SwinVoteTransformer(x, pos_embed=cart cell grid,
                             voted_embed=[votes, vote_cls])
  hm / reg / height / dim / rot / iou <- convs on feat

Loss: SetCriterion over auction/Hungarian matching with host-precomputed
votemaps (see partner_tpu.losses.set_crit).

Decode (e2e_swv_head.py:316-360): sigmoid hm * ((iou+1)/2)^iou_factor,
absolute xy = reg + offset grid, exp dims, atan2 rot (+ center azimuth when
``rectify``), then score/range masking and device rotated NMS.
"""

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import resolve_compute_dtype

from ..core.geometry import bev_cell_centers, wrap_angle_pi
from ..ops.nms import rotate_nms_pcdet
from . import layers
from .layers import BatchNorm
from .registry import BBOX_HEADS
from .swin_vote import SwinVoteTransformer


# torch nn.BatchNorm2d default, which the reference E2E head uses
# (vs the det3d conv stacks' 1e-3 override, layers.BN_EPS)
HEAD_BN_EPS = 1e-5


class ConvHead(nn.Module):
    hidden: int
    out: int
    kernel: int = 3
    init_bias: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel, self.kernel)
        x = nn.Conv(self.hidden, k, padding=self.kernel // 2,
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        bias_init = (
            nn.initializers.constant(self.init_bias)
            if self.init_bias is not None else nn.initializers.zeros
        )
        return nn.Conv(self.out, k, padding=self.kernel // 2,
                       bias_init=bias_init,
                       dtype=self.dtype)(x).astype(jnp.float32)


class ConvBNHead(nn.Module):
    hidden: int
    out: int
    kernel: int = 3
    init_bias: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.hidden, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype)(x)
        # the reference E2E head's norms are PLAIN nn.BatchNorm2d
        # (e2e_swv_head.py:78,110 — torch defaults eps=1e-5, momentum=0.1),
        # not the det3d conv-stack eps=1e-3 override; found by the chained
        # converted-weight parity test (test_torch_parity.py)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=HEAD_BN_EPS)(x)
        x = nn.relu(x).astype(self.dtype)
        k = (self.kernel, self.kernel)
        bias_init = (
            nn.initializers.constant(self.init_bias)
            if self.init_bias is not None else nn.initializers.zeros
        )
        return nn.Conv(self.out, k, padding=self.kernel // 2,
                       bias_init=bias_init,
                       dtype=self.dtype)(x).astype(jnp.float32)


def head_offset_grid(grid_size, pc_range, out_size_factor,
                     voxel_shape="cylinder"):
    """(n_az, n_r, 2) cartesian cell-center grid for the head maps —
    param-free (e2e_swv_head.py:175-197 _generate_offset_grid), shared by
    the module's setup and the detector-side pure decode helpers."""
    n_r = grid_size[0] // out_size_factor
    n_az = grid_size[1] // out_size_factor
    voxel_size = (
        (pc_range[3] - pc_range[0]) / grid_size[0],
        (pc_range[4] - pc_range[1]) / grid_size[1],
    )
    cells = bev_cell_centers(
        (n_r, n_az), voxel_size, pc_range, out_size_factor,
        voxel_shape, center_offset=0.5,
    )
    # head maps are (az, r): transpose
    return jnp.asarray(cells[..., :2].transpose(1, 0, 2))


def flatten_head_preds(preds, offset_grid):
    """NHWC maps -> flattened (B, N, .) dicts for the set criterion.

    Pure function of the prediction maps + the param-free offset grid
    (VERDICT r3 weak #4: no module bind needed inside the jitted loss).
    pred_boxes live in the coder's encoded space:
    [abs_x, abs_y, z, log-dims..., cos, sin] (reg shifted by the offset
    grid; e2e_swv_head.py:215-246).
    """
    b, h, w, _ = preds["hm"].shape
    n = h * w
    reg_abs = preds["reg"] + offset_grid[None]
    centers_abs = preds["pred_centers"] + offset_grid[None]
    anno = jnp.concatenate(
        [reg_abs, preds["height"], preds["dim"], preds["rot"]], axis=-1
    )
    out = {
        "pred_logits": preds["hm"].reshape(b, n, -1),
        "pred_boxes": anno.reshape(b, n, -1),
        "pred_centers": centers_abs.reshape(b, n, 2),
        "pred_vote_cls": preds["pred_vote_cls"].reshape(b, n, 1),
    }
    if "iou" in preds:
        out["pred_ious"] = preds["iou"].reshape(b, n, 1)
    return out


def decode_head_preds(preds, offset_grid, iou_factor=1.0, rectify=False):
    """-> (boxes (B, N, 7), scores (B, N, ncls)); pure function
    (e2e_swv_head.py:316-360 decode semantics)."""
    b, h, w, ncls = preds["hm"].shape
    n = h * w
    hm = jax.nn.sigmoid(preds["hm"]).reshape(b, n, ncls)
    dims = jnp.exp(jnp.clip(preds["dim"], -8.0, 8.0)).reshape(b, n, 3)
    rot = jnp.arctan2(preds["rot"][..., 1],
                      preds["rot"][..., 0]).reshape(b, n)
    hei = preds["height"].reshape(b, n)
    xy = (preds["reg"] + offset_grid[None]).reshape(b, n, 2)

    if "iou" in preds:
        iou = jnp.clip((preds["iou"].reshape(b, n) + 1.0) * 0.5, 0.0, 1.0)
        hm = hm * jnp.power(iou, iou_factor)[..., None]

    if rectify:
        azs = jnp.arctan2(xy[..., 1], xy[..., 0])
        rot = wrap_angle_pi(rot + azs)

    boxes = jnp.concatenate(
        [xy, hei[..., None], dims, rot[..., None]], axis=-1
    )
    return boxes, hm


def decode_flat_preds(flat, coder, iou_factor=1.0, rectify=False):
    """Decode flattened predictions through the CONFIGURED box coder.

    -> (boxes (B, N, 7+), scores (B, N, ncls)). Same semantics as
    decode_head_preds but the box inverse is ``coder.decode`` instead of
    the hardcoded cartesian CenterCoder inverse, so CODER_CONFIG variants
    (Polar*/TP/MTTP) predict in the space they trained in (ADVICE r4).
    ``rectify`` mirrors the reference's test_cfg flag and pairing assert
    (e2e_swv_head.py:344-345: rectify requires box_coder.rectify); the
    azimuth add itself lives inside coder.decode (the true inverse), so
    nothing is double-applied here. Dims are floor-clamped for the
    downstream IoU/NMS (CenterCoderTP.decode deliberately has no clamp,
    matching the reference)."""
    if rectify and not getattr(coder, "rectify", False):
        raise ValueError(
            "test_cfg rectify=True requires a rectifying box coder "
            "(reference e2e_swv_head.py:345 asserts the same pairing)")
    scores = jax.nn.sigmoid(flat["pred_logits"])
    if "pred_ious" in flat:
        iou = jnp.clip((flat["pred_ious"][..., 0] + 1.0) * 0.5, 0.0, 1.0)
        scores = scores * jnp.power(iou, iou_factor)[..., None]
    boxes = coder.decode(flat["pred_boxes"])
    dims = jnp.maximum(boxes[..., 3:6], 1e-5)
    boxes = jnp.concatenate([boxes[..., :3], dims, boxes[..., 6:]], axis=-1)
    return boxes, scores


@BBOX_HEADS.register_module(name="E2ESWVoteHead")
class E2ESWVoteHead(nn.Module):
    in_channels: int = 512
    num_classes: int = 1
    kernel_size: int = 3
    window_size: int = 7
    sl_depth: int = 2
    num_heads: int = 4
    mlp_ratio: float = 1.0
    iou_head: bool = True
    init_bias: float = -2.19
    encode_angle_by_sincos: bool = True
    # polar grid spec for the offset grid
    grid_size: Tuple[int, int, int] = (1152, 2048, 40)
    pc_range: Tuple[float, ...] = (0.3, -3.14368, -2.0, 75.18, 3.14368, 4.0)
    out_size_factor: int = 8
    voxel_shape: str = "cylinder"
    compute_dtype: str = "float32"  # "bfloat16" halves the head's HBM traffic
    remat: bool = False  # remat the SwinVote blocks in backward (training)
    gelu_approx: bool = True  # False = torch-exact erf GELU (parity tests)

    def setup(self):
        dt = resolve_compute_dtype(self.compute_dtype)
        # (n_az, n_r, 2) cartesian cell centers
        self.offset_grid = head_offset_grid(
            self.grid_size, self.pc_range, self.out_size_factor,
            self.voxel_shape,
        )

        half = self.in_channels // 2
        self.vote_head = ConvHead(64, 2, self.kernel_size, dtype=dt,
                                  name="vote_head")
        self.vote_cls_head = ConvBNHead(
            half, 1, self.kernel_size, dtype=dt, name="vote_cls_head"
        )
        self.layer = SwinVoteTransformer(
            embed_dim=half, depth=self.sl_depth, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            compute_dtype=self.compute_dtype, remat=self.remat,
            gelu_approx=self.gelu_approx, name="layer",
        )
        self.cls_head = ConvBNHead(
            half, self.num_classes, self.kernel_size,
            init_bias=self.init_bias, dtype=dt, name="cls_head",
        )
        code = 7 + (1 if self.encode_angle_by_sincos else 0)
        self.bbox_head = ConvHead(64, code, self.kernel_size, dtype=dt,
                                  name="bbox_head")
        if self.iou_head:
            self.iou_head_mod = ConvHead(64, 1, self.kernel_size, dtype=dt,
                                         name="iou_head")

    def get_proper_xy(self, xy_maps):
        """Add the cartesian cell-center grid to (B, H, W, 2) offsets."""
        return xy_maps + self.offset_grid[None]

    def _fused_branches(self, x, branches):
        """Exact horizontal fusion of parallel conv branch heads.

        Each branch (ConvHead / ConvBNHead) is conv1 -> [BN] -> relu ->
        conv2 over the SAME input map. XLA:TPU does not horizontally
        fuse parallel convolutions, so the unfused head re-reads the
        wide BEV map once per branch and runs 64-out-channel convs that
        waste most of the 128-lane MXU tile. Fusing concatenates the
        conv1 kernels along output channels (one wide conv, one read)
        and runs conv2 as a single block-diagonal conv (zero
        cross-branch blocks — identical per-channel math, the MXU
        accumulates the zeros exactly).

        branches: list of (module, has_bn). Returns the concatenated
        (B, H, W, sum_out) map, f32 (matching each branch's final
        astype) — or None when the branches' conv kernels disagree in
        spatial size (e.g. kernel_size != 3 while ConvBNHead's first
        conv is fixed 3x3), in which case the caller must run the
        unfused path."""
        dt = resolve_compute_dtype(self.compute_dtype)
        ws1, bs1, affs, ws2, bs2 = [], [], [], [], []
        for mod, has_bn in branches:
            p = mod.variables["params"]
            ws1.append(p["Conv_0"]["kernel"])
            bs1.append(p["Conv_0"]["bias"])
            ws2.append(p["Conv_1"]["kernel"])
            bs2.append(p["Conv_1"]["bias"])
            if has_bn:
                bnp = p["BatchNorm_0"]["BatchNorm_0"]
                bns = mod.variables["batch_stats"]["BatchNorm_0"][
                    "BatchNorm_0"]
                a = bnp["scale"] * jax.lax.rsqrt(
                    bns["var"] + HEAD_BN_EPS)
                affs.append((a, bnp["bias"] - bns["mean"] * a))
            else:
                affs.append(None)
        if (len({w.shape[:2] for w in ws1}) != 1
                or len({w.shape[:2] for w in ws2}) != 1):
            return None
        k1 = ws1[0].shape[0]
        k = ws2[0].shape[0]
        hid = [w.shape[-1] for w in ws1]
        outs = [w.shape[-1] for w in ws2]
        w1 = jnp.concatenate(ws1, axis=-1).astype(dt)
        b1 = jnp.concatenate(bs1, axis=-1)
        h = jax.lax.conv_general_dilated(
            x.astype(dt), w1, (1, 1), [(k1 // 2, k1 // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1.astype(dt)
        # per-branch BN-affine (f32, like nn.BatchNorm's promotion) + relu
        parts = []
        off = 0
        for (mod, _), aff, hsz in zip(branches, affs, hid):
            seg = h[..., off : off + hsz]
            if aff is not None:
                seg = seg.astype(jnp.float32) * aff[0] + aff[1]
            parts.append(nn.relu(seg).astype(dt))
            off += hsz
        h = jnp.concatenate(parts, axis=-1)
        # block-diagonal second conv
        w2 = jnp.zeros((k, k, sum(hid), sum(outs)), dt)
        ro = co = 0
        for w, hsz, osz in zip(ws2, hid, outs):
            w2 = w2.at[:, :, ro : ro + hsz, co : co + osz].set(
                w.astype(dt))
            ro += hsz
            co += osz
        out = jax.lax.conv_general_dilated(
            h, w2, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.concatenate(bs2, axis=-1).astype(dt)
        return out.astype(jnp.float32)

    def __call__(self, x, train: bool = True):
        """x: (B, n_az, n_r, in_channels) BEV feature map."""
        det = not train
        fused = (det and not self.is_initializing()
                 and os.environ.get("PARTNER_TPU_FUSED_HEAD", "0") == "1")
        v = None
        if fused:
            v = self._fused_branches(
                x, [(self.vote_head, False), (self.vote_cls_head, True)])
        if v is not None:
            votes, vote_cls = v[..., :2], v[..., 2:3]
        else:
            votes = self.vote_head(x)  # (B, H, W, 2)
            vote_cls = self.vote_cls_head(x, train)  # (B, H, W, 1)
        voted_embed = jnp.concatenate([votes, vote_cls], axis=-1)
        pos_embed = jnp.broadcast_to(
            self.offset_grid[None], x.shape[:3] + (2,)
        )
        feat = self.layer(x, pos_embed, voted_embed, deterministic=det)

        out = {"pred_centers": votes, "pred_vote_cls": vote_cls}
        m = None
        if fused:
            branches = [(self.cls_head, True), (self.bbox_head, False)]
            if self.iou_head:
                branches.append((self.iou_head_mod, False))
            m = self._fused_branches(feat, branches)
        if m is not None:
            ncls = self.num_classes
            code = 7 + (1 if self.encode_angle_by_sincos else 0)
            out["hm"] = m[..., :ncls]
            boxes = m[..., ncls : ncls + code]
            if self.iou_head:
                out["iou"] = m[..., ncls + code : ncls + code + 1]
        else:
            out["hm"] = self.cls_head(feat, train)
            boxes = self.bbox_head(feat)
            if self.iou_head:
                out["iou"] = self.iou_head_mod(feat)
        out["reg"] = boxes[..., 0:2]
        out["height"] = boxes[..., 2:3]
        out["dim"] = boxes[..., 3:6]
        out["rot"] = boxes[..., 6:8]
        return out

    def flatten_preds(self, preds):
        """Delegates to the pure flatten_head_preds (bound-module form)."""
        return flatten_head_preds(preds, self.offset_grid)

    def decode(self, preds, iou_factor=1.0, rectify=False):
        """Delegates to the pure decode_head_preds (bound-module form)."""
        return decode_head_preds(preds, self.offset_grid, iou_factor,
                                 rectify)

    @staticmethod
    def post_process(boxes, scores, score_threshold, post_center_range,
                     nms_iou_threshold, nms_pre, nms_post):
        """Masked decode outputs -> fixed-size NMS'd detections per sample.

        Returns dict of (B, nms_post, ...) arrays + validity mask.
        """

        def one(bx, sc):
            cls_score = sc.max(-1)
            label = sc.argmax(-1)
            m = cls_score > score_threshold
            m &= jnp.all(bx[:, :3] >= jnp.asarray(post_center_range[:3]), -1)
            m &= jnp.all(bx[:, :3] <= jnp.asarray(post_center_range[3:]), -1)
            masked_scores = jnp.where(m, cls_score, -jnp.inf)
            keep, kmask = rotate_nms_pcdet(
                bx, masked_scores, nms_iou_threshold, nms_pre, nms_post
            )
            return {
                "box3d_lidar": bx[keep],
                "scores": cls_score[keep],
                "label_preds": label[keep],
                "mask": kmask & (masked_scores[keep] > -jnp.inf),
            }

        return jax.vmap(one)(boxes, scores)

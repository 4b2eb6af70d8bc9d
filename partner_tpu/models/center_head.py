"""CenterPoint heads: CenterHead (multi-task SepHead), CenterHeadSingle
(merged single-group heads + range-stratified convs), CenterHeadSinglePos
(+ polar position encoding / feature undistortion).

flax NHWC re-implementation of
/root/reference/det3d/models/bbox_heads/center_head.py:65-289 and
center_head_parallel.py:27-285, including:

- RSNorm: range-stratified GroupNorm — the range axis is split into G
  strata, each with its own normalization statistics and affine params
  (models/utils/norm.py:57-74)
- RangeStratified conv: per-stratum 3x3 conv with a one-cell range halo and
  zero-padded azimuth (center_head_parallel.py:28-60)
- merged heads: 'rot_vel' style grouped convs emitting several sub-heads
  from one conv stack (center_head_parallel.py:135-162)
- polar position encoding [x, y, r, cos, sin] driving calibration weight /
  bias on the heatmap branch (center_head_parallel.py:226-285)

Losses: FastFocal heatmap + L1 reg at peaks (losses/centernet.py). Decode
follows CenterHead.decode (center_head.py:352-403): cell positions WITHOUT
the +0.5 offset, cartesian reg offsets for cylinder grids, optional rectify
of yaw/velocity by the cell azimuth.
"""

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import bev_cell_centers
from ..losses.centernet import fast_focal_loss, reg_loss
from ..ops.nms import batched_rotated_nms, rotate_nms_pcdet
from .registry import BBOX_HEADS


class RSNorm(nn.Module):
    """Range-stratified GroupNorm over NHWC (B, az, r, C)."""

    num_heads: int = 1
    num_groups: int = 4  # strata along range
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        g = self.num_groups
        step = w // g
        xs = x[..., : step * g, :].reshape(b, h, g, step, c)
        # GroupNorm with num_heads groups over channels, per stratum
        ch_per_group = c // self.num_heads
        xg = xs.reshape(b, h, g, step, self.num_heads, ch_per_group)
        mean = xg.mean(axis=(1, 3, 5), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 3, 5), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        xs = xg.reshape(b, h, g, step, c)
        scale = self.param("scale", nn.initializers.ones, (g, 1, c))
        bias = self.param("bias", nn.initializers.zeros, (g, 1, c))
        xs = xs * scale + bias
        out = xs.reshape(b, h, step * g, c)
        if step * g < w:
            # ragged tail: normalize with the LAST stratum's statistics and
            # affine params (not raw pass-through)
            tail = x[..., step * g:, :]
            tg = tail.reshape(b, h, 1, w - step * g, self.num_heads,
                              ch_per_group)
            tm = mean[:, :, -1:], var[:, :, -1:]
            tg = (tg - tm[0]) * jax.lax.rsqrt(tm[1] + self.eps)
            tail = tg.reshape(b, h, w - step * g, c)
            tail = tail * scale[-1] + bias[-1]
            out = jnp.concatenate([out, tail], axis=2)
        return out


class RangeStratified(nn.Module):
    """Per-stratum 3x3 conv + per-stratum GroupNorm + ReLU."""

    features: int
    num_groups: int = 8
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        g = self.num_groups
        ka, kr = self.kernel
        pa, pr = ka // 2, kr // 2
        step = w // g

        xp = jnp.pad(x, ((0, 0), (pa, pa), (pr, pr), (0, 0)))
        strata = jnp.stack(
            [xp[:, :, i * step : i * step + step + 2 * pr, :] for i in range(g)],
            axis=1,
        )  # (B, G, az+2pa, step+2pr, C)

        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (g, ka, kr, c, self.features),
        )
        kbias = self.param("bias", nn.initializers.zeros, (g, self.features))

        def conv_one(xi, ki, bi):
            y = jax.lax.conv_general_dilated(
                xi, ki, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bi

        y = jax.vmap(conv_one, in_axes=(1, 0, 0), out_axes=1)(
            strata, kernel, kbias
        )  # (B, G, az, step, F)

        # per-stratum GroupNorm(1 group over F) + ReLU
        mean = y.mean(axis=(2, 3, 4), keepdims=True)
        var = ((y - mean) ** 2).mean(axis=(2, 3, 4), keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("gn_scale", nn.initializers.ones,
                           (g, 1, 1, self.features))
        bias = self.param("gn_bias", nn.initializers.zeros,
                          (g, 1, 1, self.features))
        y = nn.relu(y * scale + bias)
        return y.transpose(0, 2, 1, 3, 4).reshape(b, h, g * step, self.features)


class ConvGNStack(nn.Module):
    """num_conv-1 x (conv3 + GroupNorm + ReLU) + final conv3."""

    out: int
    num_conv: int = 2
    hidden: int = 64
    groups: int = 1
    init_bias: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_conv - 1):
            x = nn.Conv(self.hidden, (3, 3), padding=1,
                        feature_group_count=self.groups)(x)
            x = nn.GroupNorm(num_groups=self.hidden)(x)
            x = nn.relu(x)
        bias_init = (
            nn.initializers.constant(self.init_bias)
            if self.init_bias is not None else nn.initializers.zeros
        )
        return nn.Conv(self.out, (3, 3), padding=1,
                       feature_group_count=self.groups, bias_init=bias_init)(x)


class SepHead(nn.Module):
    """Per-task separate conv heads (center_head.py:65-107).

    At inference the standard num_conv=2 branch stacks CAN be
    horizontally fused — one concatenated-kernel hidden conv + one
    block-diagonal out conv — mathematically identical per channel,
    params unchanged (see e2e_head._fused_branches). On-chip A/B
    (2026-08-19, /tmp/perf_r3) measured the fusion as a LOSS at frame
    scale (50.08 FPS unfused vs 48.56 fused — the block-diagonal conv2
    adds real MXU FLOPs that outweigh the saved input reads), so it is
    default OFF; PARTNER_TPU_FUSED_HEAD=1 opts in."""

    heads: Any  # dict name -> (out_channels, num_conv)
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool = True):
        heads = dict(self.heads)
        fused = (
            not train and not self.is_initializing()
            and os.environ.get("PARTNER_TPU_FUSED_HEAD", "0") == "1"
            and len(heads) > 1
            and all(nc == 2 for _, nc in heads.values())
        )
        mods = {}
        for name, (classes, num_conv) in heads.items():
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if "hm" in name else nn.initializers.zeros
            )
            mods[name] = (
                [nn.Conv(64, (3, 3), padding=1, name=f"{name}_conv{i}")
                 for i in range(num_conv - 1)],
                nn.Conv(classes, (3, 3), padding=1, bias_init=bias_init,
                        name=f"{name}_out"),
            )
        if not fused:
            out = {}
            for name, (classes, num_conv) in heads.items():
                y = x
                for conv in mods[name][0]:
                    y = nn.relu(conv(y))
                out[name] = mods[name][1](y)
            return out

        # bind params via dummy 1x1 calls (dead-code-eliminated under jit)
        for name in heads:
            mods[name][0][0](x[:, :1, :1, :])
            mods[name][1](jnp.zeros((1, 1, 1, 64), x.dtype))

        def p(mod):
            return mod.variables["params"]

        names = list(heads)
        w1 = jnp.concatenate(
            [p(mods[n][0][0])["kernel"] for n in names], axis=-1)
        b1 = jnp.concatenate(
            [p(mods[n][0][0])["bias"] for n in names], axis=-1)
        h = jax.lax.conv_general_dilated(
            x, w1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1
        h = nn.relu(h)
        outs = [heads[n][0] for n in names]
        w2 = jnp.zeros((3, 3, 64 * len(names), sum(outs)), x.dtype)
        co = 0
        for i, n in enumerate(names):
            w2 = w2.at[:, :, i * 64 : (i + 1) * 64,
                       co : co + outs[i]].set(p(mods[n][1])["kernel"])
            co += outs[i]
        b2 = jnp.concatenate([p(mods[n][1])["bias"] for n in names], axis=-1)
        m = jax.lax.conv_general_dilated(
            h, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b2
        out = {}
        co = 0
        for i, n in enumerate(names):
            out[n] = m[..., co : co + outs[i]]
            co += outs[i]
        return out


class FeatureAdaption(nn.Module):
    """DCN-v1 feature adaption (center_head.py:25-63): a zero-initialized
    1x1 conv predicts per-tap offsets, a deformable 3x3 conv resamples the
    features, ReLU. Zero-init makes it an identity-neighborhood conv at
    start of training, exactly like the reference's ``init_offset``."""

    out_channels: int
    kernel: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import deform_conv2d

        g, k = self.deformable_groups, self.kernel * self.kernel
        offsets = nn.Conv(g * k * 2, (1, 1), use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          name="conv_offset")(x)
        c = x.shape[-1]
        w = self.param(
            "deform_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, c, self.out_channels),
        )
        b = self.param("deform_bias", nn.initializers.zeros,
                       (self.out_channels,))
        y = deform_conv2d(x, offsets, w, bias=b, kernel=self.kernel,
                          deformable_groups=g)
        return nn.relu(y)


class DCNSepHead(nn.Module):
    """Separate DCN-adapted features for classification vs regression
    (center_head.py:111-163): two FeatureAdaption branches, a conv-BN-conv
    heatmap head on the cls branch, a SepHead on the reg branch."""

    num_cls: int
    heads: Any  # dict name -> (out_channels, num_conv), WITHOUT 'hm'
    head_conv: int = 64
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        center_feat = FeatureAdaption(in_ch, name="feature_adapt_cls")(x)
        reg_feat = FeatureAdaption(in_ch, name="feature_adapt_reg")(x)

        y = nn.Conv(self.head_conv, (3, 3), padding=1)(center_feat)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(y)
        y = nn.relu(y)
        hm = nn.Conv(self.num_cls, (3, 3), padding=1,
                     bias_init=nn.initializers.constant(self.init_bias),
                     name="hm_out")(y)

        ret = SepHead(heads=tuple(sorted(dict(self.heads).items())),
                      init_bias=self.init_bias, name="task_head")(
                          reg_feat, train)
        ret["hm"] = hm
        return ret


def _split_merged_heads(head_name, tensor):
    """'rot_vel' -> {'rot': ..., 'vel': ...} channel split."""
    names = head_name.split("_")
    dim = tensor.shape[-1] // len(names)
    return {nm: tensor[..., j * dim : (j + 1) * dim]
            for j, nm in enumerate(names)}


@BBOX_HEADS.register_module(name="CenterHead")
class CenterHead(nn.Module):
    in_channels: int = 512
    tasks: Any = ()
    common_heads: Any = None
    share_conv_channel: int = 64
    num_hm_conv: int = 2
    init_bias: float = -2.19
    dcn_head: bool = False  # DCNSepHead path (nusc *_dcn configs)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.share_conv_channel, (3, 3), padding=1)(x)
        x = nn.relu(x)
        rets = []
        for i, task in enumerate(list(self.tasks)):
            if self.dcn_head:
                rets.append(
                    DCNSepHead(num_cls=len(task["class_names"]),
                               heads=dict(self.common_heads or {}),
                               init_bias=self.init_bias,
                               name=f"task{i}")(x, train)
                )
            else:
                heads = dict(self.common_heads or {})
                heads["hm"] = (len(task["class_names"]), self.num_hm_conv)
                rets.append(
                    SepHead(heads=tuple(sorted(heads.items())),
                            init_bias=self.init_bias, name=f"task{i}")(
                                x, train)
                )
        return {"det_preds": rets}


@BBOX_HEADS.register_module(name="CenterHeadSingle")
class CenterHeadSingle(nn.Module):
    """Merged single-group heads with range stratification."""

    in_channels: int = 512
    tasks: Any = ()
    common_heads: Any = None
    share_conv_channel: int = 64
    num_hm_conv: int = 2
    init_bias: float = -2.19
    rs_groups: int = 8

    def _heads(self):
        return dict(self.common_heads or
                    {"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                     "rot": (2, 2)})

    def num_classes(self):
        return sum(len(t["class_names"]) for t in list(self.tasks))

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.share_conv_channel, (3, 3), padding=1,
                    name="shared_conv")(x)
        x = RSNorm(1, 4, name="shared_norm")(x)
        x = nn.relu(x)

        ret = {}
        for name, (classes, num_conv) in self._heads().items():
            if "reg" in name:
                y = RangeStratified(64, self.rs_groups, name=f"{name}_rs")(x)
                y = nn.Conv(classes, (1, 1), name=f"{name}_out")(y)
                ret.update(_split_merged_heads(name, y)
                           if "_" in name else {name: y})
            elif "_" in name:
                n = len(name.split("_"))
                y = ConvGNStack(classes * n, num_conv, groups=n,
                                name=f"{name}_stack")(x)
                ret.update(_split_merged_heads(name, y))
            else:
                y = ConvGNStack(classes, num_conv, name=f"{name}_stack")(x)
                ret[name] = y

        hm = ConvGNStack(self.num_classes(), self.num_hm_conv,
                         init_bias=self.init_bias, name="hm_stack")(
            self._hm_input(x, train)
        )
        ret["hm"] = hm
        return {"det_preds": [ret]}

    def _hm_input(self, x, train):
        return x


@BBOX_HEADS.register_module(name="CenterHeadSinglePos")
class CenterHeadSinglePos(CenterHeadSingle):
    """CenterHeadSingle + polar position-encoded heatmap calibration."""

    voxel_generator: Any = None
    out_size_factor: int = 8

    def _pos_encoding(self, hw):
        vg = dict(self.voxel_generator or {})
        pc_range = vg["range"]
        voxel_size = vg["voxel_size"]
        nsectors = vg.get("nsectors", 1)
        interval = (pc_range[4] - pc_range[1]) / nsectors
        ref = list(pc_range)
        ref[4] = ref[1] + interval
        cells = bev_cell_centers(
            (hw[1], hw[0]), voxel_size, ref, self.out_size_factor,
            "cylinder", center_offset=0.0,
        )  # (r, az, [x, y, rho, phi])
        x, y, r, phi = (cells[..., i] for i in range(4))
        enc = np.stack([x, y, r, np.cos(phi), np.sin(phi)], -1)
        return jnp.asarray(enc.transpose(1, 0, 2))  # (az, r, 5)

    def _hm_input(self, x, train):
        pos = self._pos_encoding((x.shape[1], x.shape[2]))
        pos = jnp.broadcast_to(pos[None], x.shape[:3] + (5,))

        w = nn.Conv(64, (3, 3), padding=1, name="cal_w0")(pos)
        w = jnp.tanh(w)
        w = nn.Conv(64, (1, 1), name="cal_w1")(w)
        w = jnp.tanh(w)
        b = nn.Conv(64, (3, 3), padding=1, name="cal_b0")(pos)
        b = jnp.tanh(b)
        b = nn.Conv(64, (1, 1), name="cal_b1")(b)
        return x * w + b


# ---------------------------------------------------------------------------
# loss / decode drivers (pure functions over head outputs)
# ---------------------------------------------------------------------------


def center_head_loss(preds_dicts, example, code_weights, weight,
                     dataset="waymo"):
    """FastFocal + weighted L1 reg per task (center_head.py:248-289).

    example carries per-task targets: hm (list of (B, az, r, C)),
    anno_box (B, M, 10), ind/mask/cat (B, M).
    """
    rets = {"det_loss": [], "hm_loss": [], "loc_loss": []}
    total = 0.0
    for task_id, preds in enumerate(preds_dicts["det_preds"]):
        hm = jnp.clip(jax.nn.sigmoid(preds["hm"]), 1e-4, 1 - 1e-4)
        target_hm = example["hm"][task_id]
        if target_hm.shape[1] != hm.shape[1]:  # (B, C, az, r) -> NHWC
            target_hm = target_hm.transpose(0, 2, 3, 1)
        hm_l = fast_focal_loss(
            hm, target_hm, example["ind"][task_id],
            example["mask"][task_id], example["cat"][task_id],
        )
        target_box = example["anno_box"][task_id]
        if "vel" in preds:
            anno = jnp.concatenate(
                [preds["reg"], preds["height"], preds["dim"], preds["vel"],
                 preds["rot"]], axis=-1,
            )
        else:
            anno = jnp.concatenate(
                [preds["reg"], preds["height"], preds["dim"], preds["rot"]],
                axis=-1,
            )
            target_box = target_box[..., jnp.array([0, 1, 2, 3, 4, 5, 8, 9])]
        box_l = reg_loss(anno, example["mask"][task_id],
                         example["ind"][task_id], target_box)
        loc = (box_l * jnp.asarray(code_weights[: box_l.shape[0]])).sum()
        task_loss = hm_l + weight * loc
        total = total + task_loss
        rets["det_loss"].append(task_loss)
        rets["hm_loss"].append(hm_l)
        rets["loc_loss"].append(loc)
    rets["loss"] = total
    return rets


def center_head_decode(preds, grid_hw, voxel_size, pc_range, out_size_factor,
                       voxel_shape="cylinder", rectify=False,
                       pre_activated=False):
    """One task's maps -> (boxes (B, N, 7 or 9), scores (B, N, C)).

    grid_hw = (n_az, n_r) of the feature map. ``pre_activated`` marks maps
    whose hm is already sigmoided and dim already exp'd (the
    double_flip_average output contract)."""
    b, h, w, ncls = preds["hm"].shape
    n = h * w
    if pre_activated:
        hm = preds["hm"].reshape(b, n, ncls)
        dims = preds["dim"].reshape(b, n, 3)
    else:
        hm = jax.nn.sigmoid(preds["hm"]).reshape(b, n, ncls)
        dims = jnp.exp(jnp.clip(preds["dim"], -8.0, 8.0)).reshape(b, n, 3)
    # targets store (sin, cos) (preprocess.py:330-341)
    rot = jnp.arctan2(preds["rot"][..., 0], preds["rot"][..., 1]).reshape(b, n)
    hei = preds["height"].reshape(b, n)
    reg = preds["reg"].reshape(b, n, 2)

    cells = bev_cell_centers(
        (w, h), voxel_size, pc_range, out_size_factor, voxel_shape,
        center_offset=0.0,
    )  # (r, az, 4)
    cart = jnp.asarray(cells[..., :2].transpose(1, 0, 2)).reshape(1, n, 2)

    if voxel_shape == "cylinder":
        xs = cart[..., 0] + reg[..., 0]
        ys = cart[..., 1] + reg[..., 1]
        azs = jnp.arctan2(ys, xs)
        if rectify:
            rot = rot + azs
    else:
        idx = jnp.stack(
            jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij"), -1
        ).reshape(1, n, 2)
        xs = (idx[..., 1] + reg[..., 0]) * out_size_factor * voxel_size[0] + pc_range[0]
        ys = (idx[..., 0] + reg[..., 1]) * out_size_factor * voxel_size[1] + pc_range[1]

    parts = [xs[..., None], ys[..., None], hei[..., None], dims]
    if "vel" in preds:
        vel = preds["vel"].reshape(b, n, 2)
        if voxel_shape == "cylinder" and rectify:
            vr = jnp.linalg.norm(vel, axis=-1)
            va = jnp.arctan2(vel[..., 1], vel[..., 0]) + azs
            vel = jnp.stack([vr * jnp.cos(va), vr * jnp.sin(va)], -1)
        parts.append(vel)
    parts.append(rot[..., None])
    return jnp.concatenate(parts, axis=-1), hm


def center_head_post_process(boxes, scores, test_cfg, class_offset=0):
    """Score/range mask + rotated NMS -> fixed-size detections."""
    nms_cfg = dict(test_cfg.get("nms", {}))
    pcr = jnp.asarray(test_cfg.get(
        "post_center_limit_range", [-80, -80, -10, 80, 80, 10]
    ))
    thr = test_cfg.get("score_threshold", 0.1)
    per_class = test_cfg.get("per_class_nms", False)

    def one(bx, sc):
        cls_score = sc.max(-1)
        label = sc.argmax(-1)
        m = cls_score > thr
        m &= jnp.all(bx[:, :3] >= pcr[:3], -1)
        m &= jnp.all(bx[:, :3] <= pcr[3:], -1)
        masked = jnp.where(m, cls_score, -jnp.inf)
        if per_class:
            bev = bx[:, jnp.array([0, 1, 3, 4])]
            bev = jnp.concatenate([bev, bx[:, -1:]], axis=-1)
            keep, kmask = batched_rotated_nms(
                bev, masked, label,
                nms_cfg.get("nms_iou_threshold", 0.2),
                nms_cfg.get("nms_post_max_size", 83),
            )
        else:
            bx7 = jnp.concatenate(
                [bx[:, :6], bx[:, -1:]], axis=-1
            )
            keep, kmask = rotate_nms_pcdet(
                bx7, masked, nms_cfg.get("nms_iou_threshold", 0.7),
                nms_cfg.get("nms_pre_max_size", 4096),
                nms_cfg.get("nms_post_max_size", 500),
            )
        return {
            "box3d_lidar": bx[keep],
            "scores": cls_score[keep],
            "label_preds": label[keep] + class_offset,
            "mask": kmask & (masked[keep] > -jnp.inf),
        }

    return jax.vmap(one)(boxes, scores)


def double_flip_average(preds):
    """Test-time double-flip averaging (center_head.py:290-348).

    preds: one task's map dict with batch B*4, grouped [orig, yflip
    (y=-y, flip along H), xflip (x=-x, flip along W), xyflip]; maps are
    NHWC cartesian BEV. Returns the de-flipped, averaged (B, ...) dict
    with hm already sigmoided and dim already exp'd (decode must be told
    via `pre_activated`).
    """
    out = {}
    four = {}
    for k, v in preds.items():
        b4, h, w, c = v.shape
        v = v.reshape(b4 // 4, 4, h, w, c)
        v = v.at[:, 1].set(v[:, 1, ::-1])
        v = v.at[:, 2].set(v[:, 2, :, ::-1])
        v = v.at[:, 3].set(v[:, 3, ::-1, ::-1])
        four[k] = v

    out["hm"] = jax.nn.sigmoid(four["hm"]).mean(axis=1)
    out["dim"] = jnp.exp(four["dim"]).mean(axis=1)
    out["height"] = four["height"].mean(axis=1)

    reg = four["reg"]
    reg = reg.at[:, 1, ..., 1].set(1 - reg[:, 1, ..., 1])
    reg = reg.at[:, 2, ..., 0].set(1 - reg[:, 2, ..., 0])
    reg = reg.at[:, 3, ..., 0].set(1 - reg[:, 3, ..., 0])
    reg = reg.at[:, 3, ..., 1].set(1 - reg[:, 3, ..., 1])
    out["reg"] = reg.mean(axis=1)

    rots = four["rot"][..., 0:1]
    rotc = four["rot"][..., 1:2]
    rotc = rotc.at[:, 1].multiply(-1)   # yflip: theta -> pi - theta
    rots = rots.at[:, 2].multiply(-1)   # xflip: theta -> -theta
    rots = rots.at[:, 3].multiply(-1)
    rotc = rotc.at[:, 3].multiply(-1)
    out["rot"] = jnp.concatenate(
        [rots.mean(axis=1), rotc.mean(axis=1)], -1)

    if "vel" in four:
        vel = four["vel"]
        vel = vel.at[:, 1, ..., 1].multiply(-1)
        vel = vel.at[:, 2, ..., 0].multiply(-1)
        vel = vel.at[:, 3].multiply(-1)
        out["vel"] = vel.mean(axis=1)
    if "iou" in four:
        out["iou"] = four["iou"].mean(axis=1)
    return out

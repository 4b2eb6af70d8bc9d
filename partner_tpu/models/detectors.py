"""Detector assemblies: VoxelNet (CenterPoint-style) and VoxelNetV3 (PARTNER).

flax re-engineering of /root/reference/det3d/models/detectors/voxelnet.py.
A detector is a flax module built from registry cfg dicts (reader /
backbone / neck / bbox_head), wrapped by :class:`Detector`, a thin pure
driver that mirrors the reference call contract:

  det = build_detector(cfg.model, train_cfg, test_cfg)
  variables = det.init(rng, example)
  losses = det.loss(variables, example, rng)      # jittable
  preds  = det.predict(variables, example)        # jittable, NMS'd output

``example`` is the fixed-shape batch from the data pipeline:
  features (B, N, C) or voxels (B, N, K, C) + num_points, coords (B, N, 3),
  voxel_mask (B, N), and training targets (global_box, votemap, hm, ...).
"""

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.center_coder import CenterCoder, build_coder
from ..core.geometry import bev_cell_centers
from ..losses.set_crit import SetCriterion
from ..utils.dtypes import resolve_compute_dtype
from . import e2e_head
from .registry import BACKBONES, BBOX_HEADS, DETECTORS, NECKS, READERS, build_from_cfg
from .set_transformer import SetBlockStack


def _grid_spec(cfg):
    vg = cfg["voxel_generator"]
    pc_range = tuple(vg["range"])
    voxel_size = tuple(vg["voxel_size"])
    grid = tuple(
        int(round((pc_range[3 + i] - pc_range[i]) / voxel_size[i]))
        for i in range(3)
    )
    return grid, pc_range, voxel_size


class VoxelNetModule(nn.Module):
    """Backbone + (optional SetBlock stack) + neck + head(s), NHWC.

    ``head_cfg`` may be None for segmentation-only models (the reference's
    voxelnet_seg_* configs build VoxelNet with bbox_head=None,
    /root/reference/configs/nusc/voxelnet/voxelnet_seg_10sweep.py:30-60);
    ``seg_head_cfg`` adds a semantic head fed by the backbone's dense
    canvas (dense backbone) or the BEV map (sparse backbone)."""

    reader_cfg: Any
    backbone_cfg: Any
    neck_cfg: Any
    head_cfg: Any
    grid_size: Tuple[int, int, int]
    pc_range: Tuple[float, ...]
    seg_head_cfg: Any = None
    out_size_factor: int = 8
    with_set_attention: bool = False
    set_cfg: Optional[Dict[str, Any]] = None
    # optional PartitionSpec for the (B, n_az, n_r, C) BEV map — sharding the
    # azimuth axis over the 'azimuth' mesh axis makes XLA spatially partition
    # the neck convs with automatic halo exchange (SP; SURVEY.md 5.7)
    bev_pspec: Any = None
    # probe-only: insert stop_gradient after the named phases
    # ("backbone" | "set" | "neck") so the train-anatomy probe can
    # attribute BACKWARD time per phase by differencing grad programs
    # (tools/probes/train_anatomy.py; VERDICT r4 next #2). Never set in
    # production configs.
    sg_after: Tuple[str, ...] = ()

    def setup(self):
        self.reader = build_from_cfg(dict(self.reader_cfg), READERS)
        self.backbone = build_from_cfg(dict(self.backbone_cfg), BACKBONES)
        self.neck = build_from_cfg(dict(self.neck_cfg), NECKS)
        if self.head_cfg is not None:
            head_cfg = dict(self.head_cfg)
            head_cfg.setdefault("grid_size", self.grid_size)
            head_cfg.setdefault("pc_range", self.pc_range)
            head_cfg.setdefault("out_size_factor", self.out_size_factor)
            self.bbox_head = build_from_cfg(head_cfg, BBOX_HEADS)
        else:
            self.bbox_head = None
        if self.seg_head_cfg:
            from .registry import SEG_HEADS
            sc = {k: v for k, v in dict(self.seg_head_cfg).items()
                  if k in ("type", "num_classes", "kernel", "in_channels",
                           "up_scale", "height", "weight")}
            self.seg_head = build_from_cfg(sc, SEG_HEADS)
        else:
            self.seg_head = None

        if self.with_set_attention:
            voxel_size = tuple(
                (self.pc_range[3 + i] - self.pc_range[i]) / self.grid_size[i]
                for i in range(3)
            )
            n_r = self.grid_size[0] // self.out_size_factor
            n_az = self.grid_size[1] // self.out_size_factor
            self.bev_pos = jnp.asarray(
                bev_cell_centers(
                    (n_r, n_az), voxel_size, self.pc_range,
                    self.out_size_factor, "cylinder", center_offset=0.5,
                )[..., :2]
            )
            set_cfg = dict(self.set_cfg or {})
            self.attns = SetBlockStack(
                depth=set_cfg.get("set_depth", 2),
                num_heads=set_cfg.get("set_num_heads", 4),
                num_keypoints=set_cfg.get("set_h", 4),
                range_window=set_cfg.get("set_w", 8),
                drop=set_cfg.get("set_drop", 0.1),
                attn_drop=set_cfg.get("set_attn_drop", 0.1),
                drop_path=set_cfg.get("set_drop_path", 0.1),
                dtype=resolve_compute_dtype(
                    set_cfg.get("set_compute_dtype", "float32")),
                remat=set_cfg.get("set_remat", False),
            )

    def __call__(self, example, train: bool = True, return_bev: bool = False):
        if ("features" not in example and "voxels" not in example
                and "points" in example
                and hasattr(self.backbone, "encode_points")):
            # point fast path: skip voxelization entirely — the dense
            # backbone decorates and pools raw points itself
            bev, multi_scale = self.backbone.encode_points(
                example["points"], example["points_mask"], self.grid_size,
                self.pc_range, train=train,
            )
        else:
            if "voxels" in example:  # hard-voxelized path: (B, N, K, C)
                features = self.reader(example["voxels"],
                                       example["num_points"])
            else:  # dynamic path: mean features precomputed on device
                features = self.reader(example["features"])
            bev, multi_scale = self.backbone(
                features, example["coords"], example["voxel_mask"],
                self.grid_size, train=train,
            )  # (B, n_az/8, n_r/8, C)

        if "backbone" in self.sg_after:
            bev = jax.lax.stop_gradient(bev)

        if self.with_set_attention:
            x = bev.transpose(0, 2, 1, 3)  # (B, n_r, n_az, C)
            pos = jnp.broadcast_to(self.bev_pos[None], x.shape[:3] + (2,))
            x = self.attns(x, pos, deterministic=not train, train=train)
            bev = x.transpose(0, 2, 1, 3)
        if "set" in self.sg_after:
            bev = jax.lax.stop_gradient(bev)

        if self.bev_pspec is not None:
            bev = jax.lax.with_sharding_constraint(bev, self.bev_pspec)

        x = self.neck(bev, train=train)
        if "neck" in self.sg_after:
            x = jax.lax.stop_gradient(x)
        out = self.bbox_head(x, train=train) if self.bbox_head else {}
        if self.seg_head is not None:
            # dense backbone exposes its pooled 3D canvas; the sparse
            # backbone path falls back to the BEV map (4D canvas)
            canvas = None
            if isinstance(multi_scale, dict):
                canvas = multi_scale.get("canvas")
            if canvas is None or not hasattr(canvas, "ndim"):
                canvas = bev
            out = dict(out)
            out["seg_preds"] = self.seg_head(canvas, x, train=train)[
                "seg_preds"]
        if return_bev:
            return out, x
        return out


class Detector:
    """Pure driver around the flax module: init / forward plumbing."""

    # preferred eval-time input contract: "voxels" = features/coords/
    # voxel_mask (device-voxelized upstream), "points" = raw padded
    # points/points_mask (the detector voxelizes/sectorizes on device).
    # tools/dist_test.py routes batches by this (reference collects every
    # model through one example dict, tools/dist_test.py:161-216).
    input_kind = "voxels"

    def __init__(self, module: VoxelNetModule, test_cfg=None):
        self.module = module
        self.test_cfg = dict(test_cfg or {})

    def init(self, rng, example):
        # jitted: eager init at flagship scale pays a per-op dispatch
        # round-trip on remote backends (measured 400+ s vs seconds)
        import functools

        return jax.jit(
            functools.partial(self.module.init, train=False)
        )(rng, example)

    def apply(self, variables, example, train=False, rngs=None,
              mutable=False):
        return self.module.apply(
            variables, example, train=train, rngs=rngs, mutable=mutable
        )

    def forward(self, variables, example, rng=None, train=True):
        rngs = {"dropout": rng} if rng is not None else None
        return self.module.apply(
            variables, example, train=train, rngs=rngs,
            mutable=["batch_stats"] if train else [],
        )


class E2EDetector(Detector):
    """VoxelNetV3 + E2ESWVoteHead + SetCriterion."""

    def __init__(self, module, criterion, test_cfg=None):
        super().__init__(module, test_cfg)
        self.criterion = criterion
        # param-free decode constants: flatten/decode are pure functions of
        # the prediction maps + this grid — no module bind inside the
        # jitted loss/predict (VERDICT r3 weak #4)
        hc = module.head_cfg
        self.offset_grid = e2e_head.head_offset_grid(
            tuple(hc["grid_size"]), tuple(hc["pc_range"]),
            hc.get("out_size_factor", 8), hc.get("voxel_shape", "cylinder"),
        )

    def loss(self, variables, example, rng=None, train=True):
        preds, updates = self.forward(variables, example, rng, train)
        flat = e2e_head.flatten_head_preds(preds, self.offset_grid)
        # global_box (B, M, 8|10): [x,y,z,dims,(vx,vy,)yaw,class(1-based)];
        # velocity dropped like the reference (e2e_swv_head.py:206-207)
        gt = example["global_box"]
        gt_mask = example["global_box_mask"]
        gt_boxes = jnp.concatenate(
            [gt[..., :6], gt[..., -2:-1]], axis=-1
        )
        gt_classes = (gt[..., -1] - 1).astype(jnp.int32)
        votemap = example.get("votemap_flat")
        ld = self.criterion(flat, gt_boxes, jnp.maximum(gt_classes, 0),
                            gt_mask, votemap)
        return ld, updates

    def prepare_inference(self, variables, example):
        """Precompute frame-invariant inference tables (static RPE bias).

        Runs ONE eager forward with the ``rpe_cache`` collection mutable
        so each SwinVote window-attention stores its (nW, nh, T, T)
        relative-position-bias table (a pure function of the frozen RPE
        params and the fixed cell-center grid — see
        swin_vote.WindowAttention). Returns ``variables`` with the cache
        merged; threading it through subsequent ``predict`` calls skips
        the per-frame ~150 MB pair-tensor rebuild. Optional: callers that
        skip the warmup get the unchanged live path. The fill pass is
        jitted: an eager flagship forward on a remote backend dispatches
        op-by-op (one RPC each) and takes minutes.
        """
        fill = jax.jit(lambda v: self.module.apply(
            v, example, train=False, mutable=["rpe_cache"]))
        _, upd = fill(variables)
        upd = jax.tree_util.tree_map(jax.block_until_ready, upd)
        if "rpe_cache" in upd:
            variables = dict(variables)
            variables["rpe_cache"] = upd["rpe_cache"]
        return variables

    def predict(self, variables, example):
        preds = self.module.apply(variables, example, train=False)
        # decode through the CONFIGURED coder (the criterion trained the
        # regression maps in coder-encoded space, so the inverse must be
        # the same coder's — ADVICE r4 medium): for the default
        # CenterCoder this is bit-identical to the hardcoded cartesian
        # decode (test_e2e_head.py pins it)
        flat = e2e_head.flatten_head_preds(preds, self.offset_grid)
        boxes, scores = e2e_head.decode_flat_preds(
            flat, self.criterion.coder,
            iou_factor=self.test_cfg.get("iou_factor", 1.0),
            rectify=self.test_cfg.get("rectify", False),
        )
        nms_cfg = self.test_cfg.get("nms", {})
        return e2e_head.E2ESWVoteHead.post_process(
            boxes, scores,
            self.test_cfg.get("score_threshold", 0.1),
            self.test_cfg.get(
                "post_center_limit_range", [-80, -80, -10, 80, 80, 10]
            ),
            nms_cfg.get("nms_iou_threshold", 0.7),
            nms_cfg.get("nms_pre_max_size", 4096),
            nms_cfg.get("nms_post_max_size", 500),
        )


def apply_seg_decay(det_total, seg, example):
    """Curriculum seg-loss decay: total = det + seg * decay, with the
    per-epoch decay threaded through example['seg_loss_decay'] by
    tools/train.py from cfg.curriculum_weights; decay < 0 dynamically
    balances seg against the det loss (reference trainer.py:430-434 +
    parse_second_losses trainer.py:116-137). Logged seg_loss stays
    undecayed, like the reference's log_vars."""
    decay = example.get("seg_loss_decay")
    if decay is None:
        return det_total + seg
    decay = jnp.asarray(decay, jnp.float32)
    dyn = jax.lax.stop_gradient(det_total / (seg + 1e-6))
    return det_total + seg * jnp.where(decay < 0, dyn, decay)


class CenterPointDetector(Detector):
    """VoxelNet + CenterHead family (FastFocal + peak regression), with
    optional semantic segmentation (det+seg / seg-only per super_tasks,
    reference voxelnet.py:239-302 + seg_heads/seg_head.py)."""

    def __init__(self, module, code_weights, weight, dataset="waymo",
                 voxel_size=None, test_cfg=None, seg_weight=1.0,
                 voxel_shape="cylinder"):
        super().__init__(module, test_cfg)
        self.code_weights = tuple(code_weights)
        self.weight = weight
        self.seg_weight = seg_weight
        self.dataset = dataset
        self.voxel_size = voxel_size
        self.voxel_shape = voxel_shape

    def _seg_points(self, example):
        """(points, mask) the seg head labels refer to — the current
        (last) sweep for multi-sweep STROBE batches (B, S, P, C)."""
        pts = example["points"]
        mask = example["points_mask"]
        if pts.ndim == 4:
            pts, mask = pts[:, -1], mask[:, -1]
        return pts, mask

    def _seg_loss(self, preds, example):
        """Majority-label seg loss at the seg head's grid resolution."""
        from .seg_head import (majority_grid_labels, points_to_grid_cells,
                               seg_loss)

        sp = preds["seg_preds"]
        out_shape = sp.shape[1:-1]  # (D, H, W) or (H, W)
        pts, mask = self._seg_points(example)
        gi, ok = points_to_grid_cells(
            pts, mask, out_shape, self.module.pc_range, self.voxel_shape)
        labels = majority_grid_labels(gi, ok, example["points_label"],
                                      out_shape, sp.shape[-1])
        return seg_loss(sp, labels, weight=self.seg_weight)

    def loss(self, variables, example, rng=None, train=True):
        from .center_head import center_head_loss

        preds, updates = self.forward(variables, example, rng, train)
        if preds.get("det_preds"):
            ld = dict(center_head_loss(preds, example, self.code_weights,
                                       self.weight, self.dataset))
        else:
            ld = {"loss": 0.0}
        if "seg_preds" in preds and "points_label" in example:
            sl = self._seg_loss(preds, example)
            ld["seg_loss"] = sl
            ld["loss"] = apply_seg_decay(ld["loss"], sl, example)
        return ld, updates

    def predict(self, variables, example):
        from .center_head import center_head_decode, center_head_post_process

        preds = self.module.apply(variables, example, train=False)
        outs = []
        offset = 0
        for task_preds in preds.get("det_preds") or []:
            double_flip = bool(self.test_cfg.get("double_flip"))
            if double_flip:
                # batch is B*4 grouped [orig, yflip, xflip, xyflip]
                # (reference center_head.py:290-348 TTA contract); the
                # averaged maps come back pre-activated
                from .center_head import double_flip_average

                task_preds = double_flip_average(task_preds)
            hm = task_preds["hm"]
            boxes, scores = center_head_decode(
                task_preds, (hm.shape[1], hm.shape[2]), self.voxel_size,
                self.module.pc_range, self.module.out_size_factor,
                voxel_shape=self.voxel_shape,
                rectify=self.test_cfg.get("rectify", False),
                pre_activated=double_flip,
            )
            outs.append(
                center_head_post_process(boxes, scores, self.test_cfg,
                                         class_offset=offset)
            )
            offset += hm.shape[-1]
        if len(outs) == 1:
            ret = outs[0]
        elif outs:
            ret = {k: jnp.concatenate([o[k] for o in outs], axis=1)
                   for k in outs[0]}
        else:
            ret = {}
        if "seg_preds" in preds and "points" in example:
            from .seg_head import point_labels_from_grid, points_to_grid_cells

            sp = preds["seg_preds"]
            pts, mask = self._seg_points(example)
            gi, ok = points_to_grid_cells(
                pts, mask, sp.shape[1:-1],
                self.module.pc_range, self.voxel_shape)
            lab = point_labels_from_grid(sp, gi)
            ret = dict(ret)
            ret["point_seg_labels"] = jnp.where(ok, lab, 0)
        return ret


@DETECTORS.register_module(name="VoxelNetV3")
def build_voxelnet_v3(reader, backbone, neck, bbox_head, seg_head=None,
                      part_head=None, pretrained=None, train_cfg=None,
                      test_cfg=None, bev_pspec=None):
    """PARTNER detector factory (detector cfg -> Detector)."""
    grid, pc_range, _ = _grid_spec(bbox_head)
    osf = bbox_head.get("out_size_factor", 8)

    head_cfg = {
        "type": "E2ESWVoteHead",
        "in_channels": bbox_head.get("in_channels", 512),
        "num_classes": bbox_head["HEAD_CONFIG"].get("num_classes", 1),
        "kernel_size": bbox_head["HEAD_CONFIG"].get("kernel_size", 3),
        "window_size": bbox_head["HEAD_CONFIG"].get("window_size", 7),
        "sl_depth": bbox_head["HEAD_CONFIG"].get("sl_depth", [2])[0]
        if isinstance(bbox_head["HEAD_CONFIG"].get("sl_depth", [2]), (list, tuple))
        else bbox_head["HEAD_CONFIG"].get("sl_depth", 2),
        "iou_head": bbox_head["HEAD_CONFIG"].get("iou_loss", True),
        "init_bias": bbox_head["HEAD_CONFIG"].get("init_bias", -2.19),
        "grid_size": grid,
        "pc_range": pc_range,
        "out_size_factor": osf,
        "voxel_shape": bbox_head.get("voxel_shape", "cylinder"),
        "compute_dtype": bbox_head["HEAD_CONFIG"].get("compute_dtype",
                                                      "float32"),
        "remat": bbox_head["HEAD_CONFIG"].get("remat", False),
    }

    module = VoxelNetModule(
        reader_cfg=dict(reader),
        backbone_cfg=dict(backbone),
        neck_cfg={k: v for k, v in dict(neck).items()
                  if not k.startswith("set_") and k != "logger"},
        head_cfg=head_cfg,
        grid_size=grid,
        pc_range=pc_range,
        out_size_factor=osf,
        with_set_attention=True,
        set_cfg={k: v for k, v in dict(neck).items() if k.startswith("set_")},
        bev_pspec=bev_pspec,
    )

    # CODER_CONFIG["type"] selects any coder variant (the reference
    # hardwires CenterCoder, e2e_swv_head.py:121); extra keys pass through
    # to the variant ctor (template_ratio, templates_box, tmp_box, ...).
    coder_cfg = dict(bbox_head.get("CODER_CONFIG", {}))
    coder_cfg.setdefault("code_size", 7)
    coder_cfg.setdefault("encode_angle_by_sincos", True)
    coder_cfg.setdefault("rectify", False)
    coder = build_coder(coder_cfg)
    # the single-task E2E criterion never threads task_id into
    # get_delta/decode, so a multi-anchor MTTP coder would silently train
    # and decode every box against task 0's anchor — refuse at build time
    # (ADVICE r4 medium)
    tmp_box = getattr(coder, "tmp_box", None)
    if tmp_box is not None and tmp_box.shape[0] > 1:
        raise ValueError(
            "CenterCoderMTTP with multiple task anchors is unsupported by "
            "the single-task E2E head (task_id is never threaded); use one "
            "anchor row or a per-task head")
    sc = bbox_head.get("SET_CRIT_CONFIG", {})
    mc = bbox_head.get("MATCHER_CONFIG", {})
    criterion = SetCriterion(
        box_coder=coder,
        weight_dict=sc.get("weight_dict", {"loss_ce": 1, "loss_bbox": 2}),
        losses=sc.get("losses", ["loss_ce", "loss_bbox"]),
        sigma=sc.get("sigma", 3.0),
        code_weights=tuple(sc.get("code_weights", (1.0,) * 8)),
        gamma=sc.get("gamma", 2.0),
        alpha=sc.get("alpha", 0.25),
        matcher_weights=mc.get("weight_dict"),
    )
    tc = dict(test_cfg or {})
    tc.setdefault("iou_factor", bbox_head["HEAD_CONFIG"].get("iou_factor", 1))
    det = E2EDetector(module, criterion, tc)
    if dict(backbone).get("type") == "PolarDenseFHD":
        det.input_kind = "points"  # dense backbone's point fast path
    return det


@DETECTORS.register_module(name="VoxelNet")
def build_voxelnet(reader, backbone, neck, bbox_head, seg_head=None,
                   part_head=None, pretrained=None, train_cfg=None,
                   test_cfg=None, bev_pspec=None):
    """CenterPoint-style detector factory (VoxelNet + CenterHead family).

    bbox_head may be None for segmentation-only models; the grid spec then
    comes from the seg_head's voxel_generator (the reference's
    voxelnet_seg_* configs set bbox_head=None,
    /root/reference/configs/nusc/voxelnet/voxelnet_seg_10sweep.py:30)."""
    spec_src = bbox_head if bbox_head is not None else seg_head
    grid, pc_range, voxel_size = _grid_spec(spec_src)
    osf = spec_src.get("out_size_factor", 8)

    if bbox_head is not None:
        head_cfg = dict(bbox_head)
        head_cfg.pop("voxel_shape", None)
        head_cfg.pop("code_weights", None)
        head_cfg.pop("weight", None)
        head_cfg.pop("dataset", None)
        head_cfg["tasks"] = tuple(
            {"class_names": tuple(t["class_names"])}
            for t in bbox_head["tasks"]
        )
        if "common_heads" in head_cfg:
            head_cfg["common_heads"] = tuple(
                sorted((k, tuple(v)) for k, v in
                       dict(bbox_head["common_heads"]).items())
            )
    else:
        head_cfg = None

    module = VoxelNetModule(
        reader_cfg=dict(reader),
        backbone_cfg=dict(backbone),
        neck_cfg={k: v for k, v in dict(neck).items()
                  if not k.startswith("set_") and k != "logger"},
        head_cfg=head_cfg,
        seg_head_cfg=dict(seg_head) if seg_head else None,
        grid_size=grid,
        pc_range=pc_range,
        out_size_factor=osf,
        with_set_attention=False,
        bev_pspec=bev_pspec,
    )
    src = bbox_head if bbox_head is not None else {}
    det = CenterPointDetector(
        module,
        code_weights=src.get("code_weights", [1.0] * 10),
        weight=src.get("weight", 0.25),
        dataset=src.get("dataset", "waymo"),
        voxel_size=voxel_size,
        test_cfg=dict(test_cfg or {}),
        seg_weight=(seg_head or {}).get("weight", 1.0),
        voxel_shape=spec_src.get("voxel_shape", "cylinder"),
    )
    if dict(backbone).get("type") == "PolarDenseFHD":
        det.input_kind = "points"  # dense backbone's point fast path
    return det

"""PolarStream — azimuth-sector streaming detector (TPU-native).

Re-engineers /root/reference/det3d/models/detectors/polarstream.py:8-465:
the 360° sweep is processed as ``n_sectors`` azimuth sectors, each rotated
into a canonical frame (sector 0's azimuth interval, the re-referencing of
pipelines/voxelization.py:358-366), with inter-sector context carried by
the streaming necks (RPNTECP trailing-edge / RPNBDCP bidirectional,
necks/rpn_context.py) and stateful cross-sector NMS
(bbox_heads/center_head.py:485-515).

TPU-first differences from the reference:
- sector splitting happens ON DEVICE from the full fixed-shape point
  buffer (azimuth masks + rotation), so shapes stay static and the same
  module runs 1-sector (monolithic) or n-sector by changing one knob;
- contexts are explicit pytrees threaded through the sector loop (a
  Python loop over a static sector count — XLA unrolls it into one
  program), not module state;
- stateful NMS carries the previous sector's boundary-region detections
  as pre-kept suppressors with a fixed-capacity buffer.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import NEG_INF, rotated_nms
from ..ops.voxelize import dynamic_voxelize
from .detectors import Detector, _grid_spec
from .pillar import pp_scatter
from .registry import BBOX_HEADS, DETECTORS, NECKS, READERS, build_from_cfg


def cart_sector_spec(full_range, grid, n_sectors):
    """Reduced cartesian grid for azimuth-wedge streaming — the reference's
    grid-halving scheme (voxelization.py:voxelize_streaming_cart:196-222):
    every sector's wedge [-pi + s*span, -pi + (s+1)*span) is rotated into
    the canonical first wedge starting at -pi, which fits in the lower-left
    part of the cartesian bbox."""
    rng = list(full_range)
    g = list(grid)
    if n_sectors >= 4:
        g[0] //= 2
        g[1] //= 2
        rng[3] = 0.0
        rng[4] = 0.0
    elif n_sectors >= 2:
        g[1] //= 2
        rng[4] = 0.0
    return tuple(rng), tuple(g)


class PolarStreamModule(nn.Module):
    """points -> per-sector (PFN -> scatter -> streaming neck -> head).

    ``voxel_shape='cuboid'`` switches to cartesian azimuth-wedge streaming
    (the reference's voxelize_streaming_cart scheme used by the han_method
    / strobe sector configs): sectors are angle wedges of the cartesian
    grid, rotated into a canonical wedge and voxelized on the reduced
    cartesian sector grid."""

    reader_cfg: Any
    neck_cfg: Any
    head_cfg: Any
    grid_size: Tuple[int, int, int]  # FULL sweep (n_r|n_x, n_az|n_y, n_z)
    pc_range: Tuple[float, ...]     # FULL sweep
    voxel_size: Tuple[float, ...]
    seg_head_cfg: Any = None
    n_sectors: int = 1
    max_pillars: int = 32768        # per sector
    out_size_factor: int = 8
    voxel_shape: str = "cylinder"

    def angle_span(self):
        """Azimuth extent of one sector (radians)."""
        if self.voxel_shape == "cuboid":
            return 2 * np.pi / self.n_sectors
        return (self.pc_range[4] - self.pc_range[1]) / self.n_sectors

    def sector_span(self):
        return (self.pc_range[4] - self.pc_range[1]) / self.n_sectors

    def sector_range(self):
        if self.voxel_shape == "cuboid":
            return cart_sector_spec(self.pc_range, self.grid_size,
                                    self.n_sectors)[0]
        r = list(self.pc_range)
        r[4] = r[1] + self.sector_span()
        return tuple(r)

    def sector_grid(self):
        if self.voxel_shape == "cuboid":
            return cart_sector_spec(self.pc_range, self.grid_size,
                                    self.n_sectors)[1]
        g = list(self.grid_size)
        g[1] = g[1] // self.n_sectors
        return tuple(g)

    def setup(self):
        rc = dict(self.reader_cfg)
        rc.setdefault("voxel_size", self.voxel_size)
        rc.setdefault("pc_range", self.sector_range())
        self.reader = build_from_cfg(rc, READERS)
        self.neck = build_from_cfg(dict(self.neck_cfg), NECKS)
        head_cfg = dict(self.head_cfg)
        head_cfg.setdefault("grid_size", self.sector_grid())
        head_cfg.setdefault("pc_range", self.sector_range())
        head_cfg.setdefault("out_size_factor", self.out_size_factor)
        self.bbox_head = build_from_cfg(head_cfg, BBOX_HEADS)
        if self.seg_head_cfg:
            from .registry import SEG_HEADS
            sc = {k: v for k, v in dict(self.seg_head_cfg).items()
                  if k in ("num_classes", "kernel", "weight", "type")}
            self.seg_head = build_from_cfg(sc, SEG_HEADS)
        else:
            self.seg_head = None

    def _point_azimuth(self, points):
        if self.voxel_shape == "cuboid":
            return jnp.arctan2(points[..., 1], points[..., 0])
        return points[..., 1]

    def _azimuth_origin(self):
        return -np.pi if self.voxel_shape == "cuboid" else self.pc_range[1]

    def sector_point_cap(self, n_points):
        """Fixed per-sector point capacity for the compact buffers: an
        even share plus 60% headroom for azimuth imbalance, padded to a
        lane multiple."""
        cap = int(np.ceil(n_points / self.n_sectors * 1.6))
        return min(n_points, -(-cap // 128) * 128)

    def _sector_buffers(self, points, mask):
        """Partition the padded point buffer into compact per-sector
        buffers with ONE stable sort, so each sector pass touches ~P/S
        points instead of the whole buffer (the host-side split of the
        reference's streaming voxelizer, done on device with fixed
        shapes). Returns a list of (points_s, valid_s) of static size
        ``sector_point_cap``; overflow beyond the cap is dropped, like
        every other fixed-capacity buffer in the pipeline."""
        b, p, c = points.shape
        span = self.angle_span()
        az0 = self._azimuth_origin()
        phi = self._point_azimuth(points)
        sec = jnp.clip(jnp.floor((phi - az0) / span), 0,
                       self.n_sectors - 1).astype(jnp.int32)
        sec = jnp.where(mask, sec, self.n_sectors)
        order = jnp.argsort(sec, axis=-1, stable=True)
        sorted_pts = jnp.take_along_axis(points, order[..., None], axis=1)
        sorted_sec = jnp.take_along_axis(sec, order, axis=1)
        counts = jax.vmap(
            lambda ss: jnp.bincount(ss, length=self.n_sectors + 1)
        )(sorted_sec)
        offsets = jnp.concatenate(
            [jnp.zeros((b, 1), counts.dtype),
             jnp.cumsum(counts[:, :-1], axis=-1)], axis=-1)
        cap = self.sector_point_cap(p)
        idx = jnp.arange(cap)
        # pad so a slice starting at any valid offset never clamps (a
        # clamped dynamic_slice start would misalign the validity mask)
        sorted_pts = jnp.pad(sorted_pts, ((0, 0), (0, cap), (0, 0)))

        out = []
        for s in range(self.n_sectors):
            pts_s = jax.vmap(
                lambda sp, off: jax.lax.dynamic_slice(sp, (off, 0), (cap, c))
            )(sorted_pts, offsets[:, s])
            valid = idx[None, :] < jnp.minimum(counts[:, s], cap)[:, None]
            out.append((pts_s, valid))
        return out

    def _rotate_points(self, points, valid, s):
        """Re-reference a compact sector buffer to the canonical frame."""
        span = self.angle_span()
        if self.voxel_shape == "cuboid":
            x, y = points[..., 0], points[..., 1]
            rho = jnp.hypot(x, y)
            new_phi = jnp.arctan2(y, x) - s * span
            cols = [(rho * jnp.cos(new_phi))[..., None],
                    (rho * jnp.sin(new_phi))[..., None],
                    points[..., 2:3]]
            if points.shape[-1] > 3:
                cols.append(points[..., 3:])
            return jnp.concatenate(cols, axis=-1), valid
        rho = points[..., 0]
        new_phi = points[..., 1] - s * span
        cols = [rho[..., None], new_phi[..., None], points[..., 2:3],
                (rho * jnp.cos(new_phi))[..., None],
                (rho * jnp.sin(new_phi))[..., None]]
        if points.shape[-1] > 5:
            cols.append(points[..., 5:])
        return jnp.concatenate(cols, axis=-1), valid

    def _rotate_to_sector(self, points, mask, s):
        """Select sector s's points and re-reference them to sector 0.

        cylinder: points (B, P, C) [rho, phi, z, x, y, feats...];
        cuboid: points (B, P, C) [x, y, z, feats...] — the wedge
        [-pi + s*span, -pi + (s+1)*span) is rotated by -s*span so every
        sector lands on the canonical wedge starting at -pi
        (voxelize_streaming_cart:260-273 semantics)."""
        span = self.angle_span()
        if self.voxel_shape == "cuboid":
            x, y = points[..., 0], points[..., 1]
            rho = jnp.hypot(x, y)
            phi = jnp.arctan2(y, x)
            lo = -jnp.pi + s * span
            sel = mask & (phi >= lo) & (phi < lo + span)
            new_phi = phi - s * span
            cols = [(rho * jnp.cos(new_phi))[..., None],
                    (rho * jnp.sin(new_phi))[..., None],
                    points[..., 2:3]]
            if points.shape[-1] > 3:
                cols.append(points[..., 3:])
            return jnp.concatenate(cols, axis=-1), sel
        lo = self.pc_range[1] + s * span
        phi = points[..., 1]
        sel = mask & (phi >= lo) & (phi < lo + span)
        shift = s * span
        new_phi = phi - shift
        rho = points[..., 0]
        cols = [rho[..., None], new_phi[..., None], points[..., 2:3],
                (rho * jnp.cos(new_phi))[..., None],
                (rho * jnp.sin(new_phi))[..., None]]
        if points.shape[-1] > 5:
            cols.append(points[..., 5:])
        return jnp.concatenate(cols, axis=-1), sel

    def _encode_sector(self, points, mask, train):
        """Pillarize one sector (the PointPillarsModule encode contract)."""
        g = self.sector_grid()
        pillar_grid = (int(g[0]), int(g[1]), 1)
        sr = self.sector_range()
        vs = jnp.asarray(
            [self.voxel_size[0], self.voxel_size[1], sr[5] - sr[2]],
            jnp.float32)
        pr = jnp.asarray(sr, jnp.float32)

        vox = jax.vmap(
            lambda p, m: dynamic_voxelize(
                p, m, vs, pr, pillar_grid, max_voxels=self.max_pillars,
                return_point_voxel=True)
        )(points, mask)

        b, p, c = points.shape
        v = self.max_pillars
        flat_points = points.reshape(b * p, c)
        flat_mask = mask.reshape(b * p)
        offsets = (jnp.arange(b) * v)[:, None]
        flat_seg = jnp.where(
            vox["point_voxel"] < v, vox["point_voxel"] + offsets, b * v
        ).reshape(b * p)
        flat_coords = vox["coords"].reshape(b * v, 3)
        feats = self.reader(flat_points, flat_mask, flat_seg, flat_coords,
                            b * v, train)
        feats = feats.reshape(b, v, -1)
        return jax.vmap(lambda f, co, m: pp_scatter(f, co, m, g))(
            feats, vox["coords"], vox["mask"])

    def __call__(self, example, train: bool = True):
        points = example["points"]
        mask = example["points_mask"]
        preds, segs, ctx = [], [], None
        bufs = (self._sector_buffers(points, mask)
                if self.n_sectors > 1 else None)
        for s in range(self.n_sectors):
            if bufs is not None:
                pts_s, sel = self._rotate_points(*bufs[s], s)
            else:
                pts_s, sel = self._rotate_to_sector(points, mask, s)
            canvas = self._encode_sector(pts_s, sel, train)
            if self.n_sectors == 1:
                # monolithic: cyclic azimuth is handled by the neck itself
                # when it supports it; plain call otherwise
                x, ctx = self.neck(canvas, None, train=train)
            else:
                x, ctx = self.neck(canvas, ctx, train=train)
            preds.append(self.bbox_head(x, train=train))
            if self.seg_head is not None:
                segs.append(self.seg_head(canvas, x, train=train)
                            ["seg_preds"])
        out = {"sector_preds": preds}
        if segs:
            out["seg_preds"] = segs
        return out

    def point_cells(self, points, mask, s):
        """Per-point sector-grid cell indices (az_idx, r_idx) + validity."""
        g = self.sector_grid()
        sr = self.sector_range()
        pts_s, sel = self._rotate_to_sector(points, mask, s)
        r_idx = jnp.floor((pts_s[..., 0] - sr[0])
                          / ((sr[3] - sr[0]) / g[0])).astype(jnp.int32)
        a_idx = jnp.floor((pts_s[..., 1] - sr[1])
                          / ((sr[4] - sr[1]) / g[1])).astype(jnp.int32)
        ok = sel & (r_idx >= 0) & (r_idx < g[0]) & (a_idx >= 0) \
            & (a_idx < g[1])
        return a_idx, r_idx, ok


def majority_cell_labels(a_idx, r_idx, ok, point_labels, grid, n_classes):
    """Per-cell majority semantic label from labeled points (the voxel
    majority-label assigner of the reference eval kernels). Labels are
    1-based; 0 = unlabeled. Returns (B, n_az, n_r) int32."""
    n_r_cells, n_az_cells = grid[0], grid[1]
    cells = n_az_cells * n_r_cells

    def one(ai, ri, m, lab):
        lin = jnp.where(m & (lab > 0), ai * n_r_cells + ri, cells)
        onehot_idx = lin * (n_classes + 1) + jnp.clip(lab, 0, n_classes)
        counts = jnp.zeros(((cells + 1) * (n_classes + 1),), jnp.int32
                           ).at[onehot_idx].add(1, mode="drop")
        counts = counts[: cells * (n_classes + 1)].reshape(
            cells, n_classes + 1)
        counts = counts.at[:, 0].set(0)  # class 0 = unlabeled
        maj = jnp.argmax(counts, axis=-1)
        maj = jnp.where(counts.sum(-1) > 0, maj, 0)
        return maj.reshape(n_az_cells, n_r_cells)

    return jax.vmap(one, in_axes=(0, 0, 0, 0))(a_idx, r_idx, ok,
                                               point_labels)


def rotate_boxes_to_global(boxes, shift):
    """Rotate decoded sector-frame boxes by +shift around the origin.

    boxes (..., 7|9): [x, y, z, dx, dy, dz, (vx, vy,) yaw].
    """
    c, s = jnp.cos(shift), jnp.sin(shift)
    x = boxes[..., 0] * c - boxes[..., 1] * s
    y = boxes[..., 0] * s + boxes[..., 1] * c
    out = [x[..., None], y[..., None], boxes[..., 2:6]]
    if boxes.shape[-1] >= 9:
        vx = boxes[..., 6] * c - boxes[..., 7] * s
        vy = boxes[..., 6] * s + boxes[..., 7] * c
        out += [vx[..., None], vy[..., None]]
    out.append(boxes[..., -1:] + shift)
    return jnp.concatenate(out, axis=-1)


class PolarStreamDetector(Detector):
    """Driver: per-sector loss and streaming predict with stateful NMS."""

    input_kind = "points"  # sector partitioning happens on device

    def __init__(self, module, code_weights, weight, dataset="nuscenes",
                 voxel_size=None, test_cfg=None, carry_size=64,
                 carry_margin=0.2, seg_weight=2.0):
        super().__init__(module, test_cfg)
        self.code_weights = tuple(code_weights)
        self.weight = weight
        self.seg_weight = seg_weight
        self.dataset = dataset
        self.voxel_size = voxel_size
        self.carry_size = carry_size      # boundary dets carried to next NMS
        self.carry_margin = carry_margin  # rad from the shared boundary

    def loss(self, variables, example, rng=None, train=True):
        from .center_head import center_head_loss

        preds, updates = self.forward(variables, example, rng, train)
        n_sec = self.module.n_sectors
        total = 0.0
        logs = {}
        for s, sec_preds in enumerate(preds["sector_preds"]):
            if n_sec == 1:
                sub = example
            else:
                # per-sector targets carry a leading sector dim: (B, S, ...)
                sub = dict(example)
                for k in ("hm", "anno_box", "ind", "mask", "cat"):
                    sub[k] = [t[:, s] for t in example[k]]
            ld = center_head_loss(sec_preds, sub, self.code_weights,
                                  self.weight, self.dataset)
            total = total + ld["loss"]
            logs[f"sector{s}_loss"] = ld["loss"]

        if "seg_preds" in preds and "points_label" in example:
            from .seg_head import seg_loss

            mod = self.module
            # multi-sweep sector batches (B, S, P, C): seg labels refer to
            # the current (last) sweep
            pts = example["points"]
            pmask = example["points_mask"]
            if pts.ndim == 4:
                pts, pmask = pts[:, -1], pmask[:, -1]
            seg_total = 0.0
            for s, sp in enumerate(preds["seg_preds"]):
                a_idx, r_idx, ok = mod.apply(
                    variables, pts, pmask,
                    s, method=type(mod).point_cells)
                labels = majority_cell_labels(
                    a_idx, r_idx, ok, example["points_label"],
                    mod.sector_grid(), sp.shape[-1])
                seg_total = seg_total + seg_loss(
                    sp, labels, weight=self.seg_weight)
            logs["seg_loss"] = seg_total / n_sec
            from .detectors import apply_seg_decay

            total = apply_seg_decay(total, seg_total, example)
        logs["loss"] = total / n_sec
        return logs, updates

    def predict(self, variables, example):
        from .center_head import center_head_decode

        preds = self.module.apply(variables, example, train=False)
        mod = self.module
        span = mod.angle_span()
        az0 = -jnp.pi if mod.voxel_shape == "cuboid" else mod.pc_range[1]
        sr = mod.sector_range()
        nms_cfg = dict(self.test_cfg.get("nms", {}))
        thr = self.test_cfg.get("score_threshold", 0.1)
        pcr = jnp.asarray(self.test_cfg.get(
            "post_center_limit_range", [-80, -80, -10, 80, 80, 10]))
        pre = nms_cfg.get("nms_pre_max_size", 1024)
        post = nms_cfg.get("nms_post_max_size", 128)
        iou_thr = nms_cfg.get("nms_iou_threshold", 0.2)

        outs = []
        carry = None  # (B, K, 7) boxes + (B, K) scores from prev boundary
        for s, sec_preds in enumerate(preds["sector_preds"]):
            task = sec_preds["det_preds"][0]
            hw = (task["hm"].shape[1], task["hm"].shape[2])
            boxes, scores = center_head_decode(
                task, hw, self.voxel_size, sr, mod.out_size_factor,
                voxel_shape=mod.voxel_shape,
                rectify=self.test_cfg.get("rectify", False))
            boxes = rotate_boxes_to_global(boxes, s * span)

            def one(bx, sc, cb, cs):
                cls_score = sc.max(-1)
                label = sc.argmax(-1)
                m = cls_score > thr
                m &= jnp.all(bx[:, :3] >= pcr[:3], -1)
                m &= jnp.all(bx[:, :3] <= pcr[3:], -1)
                masked = jnp.where(m, cls_score, NEG_INF)
                k = min(pre, bx.shape[0])
                top_s, top_i = jax.lax.top_k(masked, k)
                bx7 = jnp.concatenate([bx[:, :6], bx[:, -1:]], -1)[top_i]
                # stateful NMS: prepend the previous sector's boundary dets
                # as pre-kept suppressors (+1e4 sorts them first; they are
                # stripped from the output below)
                n_carry = cb.shape[0]
                all_b = jnp.concatenate([cb, bx7], 0)
                bev = all_b[:, jnp.array([0, 1, 3, 4, 6])]
                all_s = jnp.concatenate([cs + 1e4, top_s], 0)
                keep, kmask = rotated_nms(bev, all_s, iou_thr,
                                          post + n_carry)
                kmask &= keep >= n_carry  # drop carried entries
                order = jnp.argsort(~kmask, stable=True)[:post]
                keep, kmask = keep[order], kmask[order]
                kept_b = all_b[keep]
                kept_s = jnp.where(kmask, all_s[keep], 0.0)
                kept_l = jnp.where(kmask, label[top_i][
                    jnp.maximum(keep - n_carry, 0)], -1)
                return kept_b, kept_s, kmask, kept_l

            if carry is None:
                ksize = min(self.carry_size, post)
                cb = jnp.zeros((boxes.shape[0], ksize, 7))
                cs = jnp.full((boxes.shape[0], ksize), NEG_INF)
            else:
                cb, cs = carry
            kb, ks, km, kl = jax.vmap(one)(boxes, scores, cb, cs)
            outs.append({"box3d_lidar": kb, "scores": ks, "mask": km,
                         "label_preds": kl})

            # next carry: kept dets within carry_margin of the leading edge
            edge = az0 + (s + 1) * span
            az = jnp.arctan2(kb[..., 1], kb[..., 0])
            daz = jnp.abs((az - edge + jnp.pi) % (2 * jnp.pi) - jnp.pi)
            near = km & (daz < self.carry_margin)
            cscore = jnp.where(near, ks, NEG_INF)
            n_keep = min(self.carry_size, cscore.shape[-1])
            top_c, idx_c = jax.lax.top_k(cscore, n_keep)
            carry = (jnp.take_along_axis(kb, idx_c[..., None], 1), top_c)

        ret = {
            k: jnp.concatenate([o[k] for o in outs], axis=1)
            for k in outs[0]
        }
        if "seg_preds" in preds:
            from .seg_head import point_labels_from_grid

            pts = example["points"]
            pmask = example["points_mask"]
            if pts.ndim == 4:
                pts, pmask = pts[:, -1], pmask[:, -1]
            plabels = []
            for s, sp in enumerate(preds["seg_preds"]):
                a_idx, r_idx, ok = mod.apply(
                    variables, pts, pmask,
                    s, method=type(mod).point_cells)
                gi = jnp.stack([jnp.zeros_like(a_idx), a_idx, r_idx], -1)
                lab = point_labels_from_grid(sp, gi)
                plabels.append(jnp.where(ok, lab, 0))
            # each point belongs to exactly one sector
            ret["point_seg_labels"] = sum(plabels)
        return ret


@DETECTORS.register_module(name="PolarStream")
@DETECTORS.register_module(name="PolarStreamBDCP")
def build_polarstream(reader, neck, bbox_head, backbone=None, seg_head=None,
                      pretrained=None, train_cfg=None, test_cfg=None,
                      max_pillars=None, part_head=None):
    """PolarStream factory. nsectors comes from the head's voxel_generator
    (nsectors key, matching the reference config contract).

    Registered under BOTH reference detector names: the reference's
    PolarStreamBDCP (det3d/models/detectors/polarstream.py) only differs
    from PolarStream by feeding previous-sweep features to the
    bidirectional-context neck, which here is selected by the neck type
    (RPNBDCP) alone — the factory is shared."""
    grid, pc_range, voxel_size = _grid_spec(bbox_head)
    osf = bbox_head.get("out_size_factor", 8)
    vg = bbox_head["voxel_generator"]
    n_sectors = vg.get("nsectors", 1)
    if max_pillars is None:
        mv = vg.get("max_voxel_num", 32768)
        mv = mv[0] if isinstance(mv, (list, tuple)) else mv
        max_pillars = max(1024, (-(-mv // n_sectors) + 7) // 8 * 8)

    head_cfg = dict(bbox_head)
    for k in ("voxel_shape", "code_weights", "weight", "dataset"):
        head_cfg.pop(k, None)
    head_cfg["tasks"] = tuple(
        {"class_names": tuple(t["class_names"])} for t in bbox_head["tasks"])
    if "common_heads" in head_cfg:
        head_cfg["common_heads"] = tuple(
            sorted((k, tuple(v)) for k, v in
                   dict(bbox_head["common_heads"]).items()))
    if "voxel_generator" in head_cfg:
        vg = dict(head_cfg["voxel_generator"])
        vg["range"] = tuple(vg["range"])
        vg["voxel_size"] = tuple(vg["voxel_size"])
        head_cfg["voxel_generator"] = tuple(sorted(vg.items()))

    neck_cfg = {k: v for k, v in dict(neck).items() if k != "logger"}
    neck_cfg.setdefault("nsectors", n_sectors)

    module = PolarStreamModule(
        reader_cfg=dict(reader),
        neck_cfg=neck_cfg,
        head_cfg=head_cfg,
        seg_head_cfg=dict(seg_head) if seg_head else None,
        grid_size=grid,
        pc_range=pc_range,
        voxel_size=voxel_size,
        n_sectors=n_sectors,
        max_pillars=max_pillars,
        out_size_factor=osf,
        voxel_shape=bbox_head.get("voxel_shape", "cylinder"),
    )
    return PolarStreamDetector(
        module,
        code_weights=bbox_head.get("code_weights", [1.0] * 10),
        weight=bbox_head.get("weight", 0.25),
        dataset=bbox_head.get("dataset", "nuscenes"),
        voxel_size=voxel_size,
        test_cfg=dict(test_cfg or {}),
        seg_weight=(seg_head or {}).get("weight", 2.0),
    )

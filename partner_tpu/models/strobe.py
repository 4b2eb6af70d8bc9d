"""STROBE / PointPillarsLSTM streaming detector families.

Polar-native re-engineering of the reference's multi-sweep and
LSTM-streaming detectors:

* ``STROBE`` (/root/reference/det3d/models/detectors/strobe_uber.py:12-278):
  iterate the sweeps of a temporal window; every sweep is encoded to a BEV
  canvas with shared weights, the RPNUber neck concatenates each block's
  input with the PREVIOUS sweep's features at the same scale
  (rpn_stream.py:RPNUber), and detection runs on the last (current) sweep.
* ``STROBEV2`` (strobe_uber.py:279-478): like STROBE but the carried
  per-scale features are first re-aligned into the current ego frame. The
  reference does this with torch ``grid_sample`` over precomputed cartesian
  sector grids; here the BEV is polar, so the alignment is the closed-form
  polar ego-motion warp (ops/warp.py:ego_motion_warp_polar).
* ``STROBEV3`` (strobe_uber.py:480-673): the reference's homography-warp
  variant; on a rigid BEV motion the homography degenerates to the same 2D
  transform, so V3 warps the raw previous canvas (full resolution) instead
  of the per-scale neck features.
* ``PointPillarsLSTM`` (streaming_waymo.py:11-157): azimuth-sector streaming
  (on the PolarStream sector machinery) where a recurrent memory summarizes
  each sector — the reference global-average-pools the canvas into an
  nn.LSTM and adds the hidden state back channel-wise on the next sector
  (streaming_waymo.py:32,100-123).
* ``PointPillarsNoLSTM`` (streaming_waymo.py:266-313): sector streaming
  without the recurrent memory (context, if any, comes from the neck).

Batch contract for STROBE (fixed shapes): ``points`` (B, S, P, C) with
``points_mask`` (B, S, P), S = sweeps ordered oldest->current, and optional
``sweep_transforms`` (B, S, 3, 3) homogeneous current->previous BEV
transforms for the V2/V3 warp. The LSTM family uses the PolarStream batch
contract (full-sweep points; sectors are sliced on device).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.warp import ego_motion_warp_polar
from .pillar import PointPillarsModule
from .polarstream import PolarStreamDetector, PolarStreamModule
from .registry import DETECTORS


class StrobeModule(PointPillarsModule):
    """Multi-sweep streaming pillars (STROBE / V2 / V3)."""

    variant: str = "v1"  # v1 raw carry | v2 warped scales | v3 warped canvas

    def __call__(self, example, train: bool = True):
        points = example["points"]          # (B, S, P, C)
        mask = example["points_mask"]       # (B, S, P)
        tfs = example.get("sweep_transforms")  # (B, S, 3, 3) or None
        s = points.shape[1]
        pr = jnp.asarray(self.pc_range, dtype=jnp.float32)

        prev_ctx, prev_canvas, x = None, None, None
        for si in range(s):
            canvas = self.encode_canvas(points[:, si], mask[:, si], train)
            if self.variant == "v2" and prev_ctx is not None \
                    and tfs is not None:
                prev_ctx = [ego_motion_warp_polar(c, tfs[:, si], pr)
                            for c in prev_ctx]
            elif self.variant == "v3" and prev_canvas is not None \
                    and tfs is not None:
                warped = ego_motion_warp_polar(prev_canvas, tfs[:, si], pr)
                _, prev_ctx = self.neck(warped, prev_sweep=None, train=train)
            x, prev_ctx = self.neck(canvas, prev_sweep=prev_ctx, train=train)
            prev_canvas = canvas
        out = self.bbox_head(x, train=train)
        if self.seg_head is not None:
            # semantic head on the current (last) sweep's canvas, like the
            # reference STROBE det+seg multi-task (strobe_uber.py seg path)
            out = dict(out)
            out["seg_preds"] = self.seg_head(canvas, x, train=train)[
                "seg_preds"]
        return out


class StrobeSectorModule(PolarStreamModule):
    """STROBE with azimuth sectors: sweeps outer loop, sectors inner loop;
    the RPNUber neck concatenates each sector's features with the SAME
    sector's features from the previous sweep (the reference's
    strobe_uber.py sector batches + rpn_uber prev-sweep concat). Detection
    and segmentation run on the current (last) sweep's sectors."""

    def __call__(self, example, train: bool = True):
        points = example["points"]          # (B, S, P, C)
        mask = example["points_mask"]       # (B, S, P)
        s_sweeps = points.shape[1]
        preds, segs = [], []
        prev = [None] * self.n_sectors
        for si in range(s_sweeps):
            last = si == s_sweeps - 1
            ctxs = []
            bufs = (self._sector_buffers(points[:, si], mask[:, si])
                    if self.n_sectors > 1 else None)
            for s in range(self.n_sectors):
                if bufs is not None:
                    pts_s, sel = self._rotate_points(*bufs[s], s)
                else:
                    pts_s, sel = self._rotate_to_sector(
                        points[:, si], mask[:, si], s)
                canvas = self._encode_sector(pts_s, sel, train)
                x, c = self.neck(canvas, prev_sweep=prev[s], train=train)
                ctxs.append(c)
                if last:
                    preds.append(self.bbox_head(x, train=train))
                    if self.seg_head is not None:
                        segs.append(self.seg_head(canvas, x, train=train)
                                    ["seg_preds"])
            prev = ctxs
        out = {"sector_preds": preds}
        if segs:
            out["seg_preds"] = segs
        return out


class PolarStreamLSTMModule(PolarStreamModule):
    """PolarStream sector loop + recurrent channel memory between sectors
    (the PointPillarsLSTM pattern, streaming_waymo.py:100-123)."""

    def setup(self):
        super().setup()
        feats = list(self.reader_cfg.get("num_filters", (64,)))[-1]
        self.lstm = nn.OptimizedLSTMCell(feats)

    def __call__(self, example, train: bool = True):
        points = example["points"]
        mask = example["points_mask"]
        preds, segs, ctx = [], [], None
        lstm_out, state = None, None
        bufs = (self._sector_buffers(points, mask)
                if self.n_sectors > 1 else None)
        for s in range(self.n_sectors):
            if bufs is not None:
                pts_s, sel = self._rotate_points(*bufs[s], s)
            else:
                pts_s, sel = self._rotate_to_sector(points, mask, s)
            canvas = self._encode_sector(pts_s, sel, train)
            if lstm_out is not None:
                canvas = canvas + lstm_out[:, None, None, :]
            x, ctx = self.neck(canvas, ctx, train=train)
            preds.append(self.bbox_head(x, train=train))
            if self.seg_head is not None:
                segs.append(self.seg_head(canvas, x, train=train)
                            ["seg_preds"])
            if s < self.n_sectors - 1:
                pooled = canvas.mean(axis=(1, 2))  # (B, F)
                if state is None:
                    state = self.lstm.initialize_carry(
                        jax.random.PRNGKey(0), pooled.shape)
                state, lstm_out = self.lstm(state, pooled)
        out = {"sector_preds": preds}
        if segs:
            out["seg_preds"] = segs
        return out


def _pillar_cfg(reader, neck, bbox_head, max_pillars):
    """Shared cfg plumbing with build_point_pillars (pillar.py:211-252)."""
    from .detectors import _grid_spec

    grid, pc_range, voxel_size = _grid_spec(bbox_head)
    osf = bbox_head.get("out_size_factor", 8)
    head_cfg = dict(bbox_head)
    for k in ("voxel_shape", "code_weights", "weight", "dataset"):
        head_cfg.pop(k, None)
    head_cfg["tasks"] = tuple(
        {"class_names": tuple(t["class_names"])} for t in bbox_head["tasks"]
    )
    if "common_heads" in head_cfg:
        head_cfg["common_heads"] = tuple(
            sorted((k, tuple(v)) for k, v in
                   dict(bbox_head["common_heads"]).items())
        )
    if "voxel_generator" in head_cfg:
        vg = dict(head_cfg["voxel_generator"])
        vg["range"] = tuple(vg["range"])
        vg["voxel_size"] = tuple(vg["voxel_size"])
        head_cfg["voxel_generator"] = tuple(sorted(vg.items()))
    return dict(
        reader_cfg=dict(reader),
        neck_cfg={k: v for k, v in dict(neck).items() if k != "logger"},
        head_cfg=head_cfg,
        grid_size=grid,
        pc_range=pc_range,
        voxel_size=voxel_size,
        max_pillars=max_pillars,
        out_size_factor=osf,
    )


def _build_strobe(variant):
    def build(reader, neck, bbox_head, backbone=None, seg_head=None,
              part_head=None, pretrained=None, train_cfg=None,
              test_cfg=None, max_pillars=None, nsectors=1):
        from .detectors import CenterPointDetector

        if max_pillars is None:
            vg = dict(bbox_head.get("voxel_generator") or {})
            mv = vg.get("max_voxel_num", 32768)
            mv = mv[0] if isinstance(mv, (list, tuple)) else mv
            max_pillars = max(1024, (-(-mv // max(nsectors, 1)) + 7) // 8 * 8)
        kw = _pillar_cfg(reader, neck, bbox_head, max_pillars)
        if nsectors > 1:
            # sector-streaming STROBE: sweeps x sectors with per-sector
            # previous-sweep context (strobe_uber.py sector batches)
            module = StrobeSectorModule(
                seg_head_cfg=dict(seg_head) if seg_head else None,
                n_sectors=nsectors,
                voxel_shape=bbox_head.get("voxel_shape", "cylinder"),
                **kw,
            )
            return PolarStreamDetector(
                module,
                code_weights=bbox_head.get("code_weights", [1.0] * 10),
                weight=bbox_head.get("weight", 0.25),
                dataset=bbox_head.get("dataset", "nuscenes"),
                voxel_size=kw["voxel_size"],
                test_cfg=dict(test_cfg or {}),
                seg_weight=(seg_head or {}).get("weight", 2.0),
            )
        module = StrobeModule(
            variant=variant,
            seg_head_cfg=dict(seg_head) if seg_head else None,
            **kw,
        )
        det = CenterPointDetector(
            module,
            code_weights=bbox_head.get("code_weights", [1.0] * 10),
            weight=bbox_head.get("weight", 0.25),
            dataset=bbox_head.get("dataset", "nuscenes"),
            voxel_size=kw["voxel_size"],
            test_cfg=dict(test_cfg or {}),
            seg_weight=(seg_head or {}).get("weight", 1.0),
            voxel_shape=bbox_head.get("voxel_shape", "cylinder"),
        )
        det.input_kind = "points"  # STROBE pillarizes sweeps on device
        return det
    return build


DETECTORS.register_module(name="STROBE")(_build_strobe("v1"))
DETECTORS.register_module(name="STROBEV2")(_build_strobe("v2"))
DETECTORS.register_module(name="STROBEV3")(_build_strobe("v3"))


def _build_pplstm(use_lstm):
    def build(reader, neck, bbox_head, backbone=None, seg_head=None,
              part_head=None, pretrained=None, train_cfg=None,
              test_cfg=None, max_pillars=None):
        vg = bbox_head["voxel_generator"]
        n_sectors = vg.get("nsectors", 1)
        if max_pillars is None:
            mv = vg.get("max_voxel_num", 32768)
            mv = mv[0] if isinstance(mv, (list, tuple)) else mv
            max_pillars = max(1024, (-(-mv // n_sectors) + 7) // 8 * 8)

        kw = _pillar_cfg(reader, neck, bbox_head, max_pillars)
        kw["neck_cfg"].setdefault("nsectors", n_sectors)
        cls = PolarStreamLSTMModule if use_lstm else PolarStreamModule
        module = cls(
            seg_head_cfg=dict(seg_head) if seg_head else None,
            n_sectors=n_sectors,
            voxel_shape=bbox_head.get("voxel_shape", "cylinder"),
            **kw,
        )
        return PolarStreamDetector(
            module,
            code_weights=bbox_head.get("code_weights", [1.0] * 10),
            weight=bbox_head.get("weight", 0.25),
            dataset=bbox_head.get("dataset", "nuscenes"),
            voxel_size=kw["voxel_size"],
            test_cfg=dict(test_cfg or {}),
            seg_weight=(seg_head or {}).get("weight", 2.0),
        )
    return build


DETECTORS.register_module(name="PointPillarsLSTM")(_build_pplstm(True))
# the reference's han_method sector-LSTM detector name
# (configs/nusc/pp/han_method/han_4_sectors.py: PointPillarsLSTMV1)
DETECTORS.register_module(name="PointPillarsLSTMV1")(_build_pplstm(True))
DETECTORS.register_module(name="PointPillarsNoLSTM")(_build_pplstm(False))

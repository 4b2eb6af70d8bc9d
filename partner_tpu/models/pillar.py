"""Polar pillar encoder + scatter + PointPillars detector assembly.

TPU-native re-implementation of the reference pillar stack
(/root/reference/det3d/models/readers/pillar_encoder.py:73-431):

- DynamicPFNet: per-point decorated features — raw point channels +
  cluster means (xyz / raz, via segment_sum over the fused voxelizer's
  point->pillar ids) + offsets from the pillar center (cartesian and/or
  polar) — through Dense+BN+ReLU PFN layers, then per-pillar segment_max.
- DynamicPPScatter: pillar features scattered onto the BEV canvas
  (B, n_az, n_r, C) NHWC.

The torch_scatter/unique machinery becomes one fused pass over the padded
point buffer reusing :func:`partner_tpu.ops.voxelize.dynamic_voxelize`.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.voxelize import dynamic_voxelize
from .layers import MaskedBatchNorm
from .registry import BACKBONES, DETECTORS, READERS, build_from_cfg


def _segment_mean(values, seg, num_segments, valid):
    s = jax.ops.segment_sum(
        jnp.where(valid[:, None], values, 0.0), seg, num_segments=num_segments
    )
    c = jax.ops.segment_sum(
        valid.astype(values.dtype), seg, num_segments=num_segments
    )
    return s / jnp.maximum(c, 1.0)[:, None]


@READERS.register_module(name="DynamicPFNet")
class DynamicPFNet(nn.Module):
    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    voxel_shape: str = "cylinder"
    xyz_cluster: bool = True
    raz_cluster: bool = True
    xy_center: bool = True
    ra_center: bool = True
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.2, 0.2, 8)
    pc_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, points, points_mask, point_pillar, pillar_coords,
                 num_pillars, train: bool = True):
        """
        points (P, C) cylinder layout [rho, phi, z, x, y, ...] (or cartesian
        [x, y, z, ..., rho, phi]); point_pillar (P,) pillar slot with
        sentinel num_pillars; pillar_coords (V, 3) (z, az, r).
        Returns pillar features (V, F).
        """
        v = num_pillars
        valid = points_mask & (point_pillar < v)
        seg = jnp.where(valid, point_pillar, v)

        feats = [points[:, : self.num_input_features]]
        if self.voxel_shape == "cuboid":
            xyz = points[:, :3]
            ra = points[:, -2:]
        else:
            xyz = points[:, jnp.array([3, 4, 2])]
            ra = points[:, :2]

        # pillar center positions in grid coords (r = coords[:, 2],
        # az = coords[:, 1]) — +0.5 cell-center offset
        c1 = pillar_coords[:, 2].astype(points.dtype) * self.voxel_size[0] \
            + self.voxel_size[0] / 2 + self.pc_range[0]
        c2 = pillar_coords[:, 1].astype(points.dtype) * self.voxel_size[1] \
            + self.voxel_size[1] / 2 + self.pc_range[1]
        c1p = jnp.concatenate([c1, jnp.zeros((1,), points.dtype)])[
            jnp.minimum(seg, v)
        ]
        c2p = jnp.concatenate([c2, jnp.zeros((1,), points.dtype)])[
            jnp.minimum(seg, v)
        ]

        if self.xyz_cluster:
            mean = _segment_mean(xyz, seg, v + 1, valid)
            feats.append(xyz - mean[jnp.minimum(seg, v)])
        if self.xy_center:
            if self.voxel_shape == "cuboid":
                xc, yc = c1p, c2p
            else:
                xc, yc = c1p * jnp.cos(c2p), c1p * jnp.sin(c2p)
            feats.append((xyz[:, 0] - xc)[:, None])
            feats.append((xyz[:, 1] - yc)[:, None])
        if self.raz_cluster:
            if self.xyz_cluster:
                mean = _segment_mean(ra, seg, v + 1, valid)
                feats.append(ra - mean[jnp.minimum(seg, v)])
            else:
                raz = jnp.concatenate([ra, points[:, 2:3]], axis=1)
                mean = _segment_mean(raz, seg, v + 1, valid)
                feats.append(raz - mean[jnp.minimum(seg, v)])
        if self.ra_center:
            if self.voxel_shape == "cuboid":
                rc = jnp.hypot(c1p, c2p)
                ac = jnp.arctan2(c2p, c1p)
            else:
                rc, ac = c1p, c2p
            feats.append((ra[:, 0] - rc)[:, None])
            feats.append((ra[:, 1] - ac)[:, None])

        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))

        x = jnp.concatenate(feats, axis=-1)
        x = x * valid[:, None]

        for i, f in enumerate(self.num_filters):
            x = nn.Dense(f, use_bias=False, name=f"pfn{i}_dense")(x)
            x = MaskedBatchNorm(use_running_average=not train,
                                name=f"pfn{i}_bn")(x, valid)
            x = nn.relu(x)
            pooled = jax.ops.segment_max(
                jnp.where(valid[:, None], x, -jnp.inf), seg,
                num_segments=v + 1,
            )
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
            if i < len(self.num_filters) - 1:
                x = jnp.concatenate(
                    [x, pooled[jnp.minimum(seg, v)]], axis=-1
                )
        return pooled[:v]


def pp_scatter(pillar_features, pillar_coords, pillar_mask, grid_size):
    """DynamicPPScatter: (V, F) -> BEV canvas (n_az, n_r, F); per-sample
    (pillar_encoder.py:408-431)."""
    n_r, n_az = int(grid_size[0]), int(grid_size[1])
    f = pillar_features.shape[-1]
    lin = pillar_coords[:, 1] * n_r + pillar_coords[:, 2]
    lin = jnp.where(pillar_mask, lin, n_az * n_r)
    canvas = jnp.zeros((n_az * n_r + 1, f), pillar_features.dtype)
    canvas = canvas.at[lin].set(
        jnp.where(pillar_mask[:, None], pillar_features, 0.0)
    )
    return canvas[:-1].reshape(n_az, n_r, f)


class PointPillarsModule(nn.Module):
    """points -> PFN -> scatter -> neck -> head(s) (NHWC).

    ``seg_head_cfg`` adds a semantic head over (canvas, neck-out) — the
    reference's det+seg pillar multi-task (the han_method / strobe config
    families, e.g. configs/nusc/pp/han_method/han_1_sector.py:54-64)."""

    reader_cfg: Any
    neck_cfg: Any
    head_cfg: Any
    grid_size: Tuple[int, int, int]
    pc_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    seg_head_cfg: Any = None
    max_pillars: int = 32768
    out_size_factor: int = 8

    def setup(self):
        rc = dict(self.reader_cfg)
        rc.setdefault("voxel_size", self.voxel_size)
        rc.setdefault("pc_range", self.pc_range)
        self.reader = build_from_cfg(rc, READERS)
        from .registry import NECKS, BBOX_HEADS

        self.neck = build_from_cfg(dict(self.neck_cfg), NECKS)
        head_cfg = dict(self.head_cfg)
        head_cfg.setdefault("grid_size", self.grid_size)
        head_cfg.setdefault("pc_range", self.pc_range)
        head_cfg.setdefault("out_size_factor", self.out_size_factor)
        self.bbox_head = build_from_cfg(head_cfg, BBOX_HEADS)
        if self.seg_head_cfg:
            from .registry import SEG_HEADS
            sc = {k: v for k, v in dict(self.seg_head_cfg).items()
                  if k in ("type", "num_classes", "kernel", "in_channels",
                           "up_scale", "height", "weight")}
            self.seg_head = build_from_cfg(sc, SEG_HEADS)
        else:
            self.seg_head = None

    def encode_canvas(self, points, points_mask, train: bool = True):
        """points (B, P, C) -> BEV canvas (B, n_az, n_r, F).

        Pillars for the whole batch are flattened into one segment space
        (slot = b * max_pillars + pillar) so the PFN's BatchNorm sees
        cross-batch point statistics like the reference's BN1d."""
        pillar_grid = (int(self.grid_size[0]), int(self.grid_size[1]), 1)
        vs = jnp.asarray(
            [self.voxel_size[0], self.voxel_size[1],
             self.pc_range[5] - self.pc_range[2]], dtype=jnp.float32,
        )
        pr = jnp.asarray(self.pc_range, dtype=jnp.float32)

        vox = jax.vmap(
            lambda p, m: dynamic_voxelize(
                p, m, vs, pr, pillar_grid, max_voxels=self.max_pillars,
                return_point_voxel=True,
            )
        )(points, points_mask)

        b, p, c = points.shape
        v = self.max_pillars
        flat_points = points.reshape(b * p, c)
        flat_mask = points_mask.reshape(b * p)
        offsets = (jnp.arange(b) * v)[:, None]
        flat_seg = jnp.where(
            vox["point_voxel"] < v, vox["point_voxel"] + offsets, b * v
        ).reshape(b * p)
        flat_coords = vox["coords"].reshape(b * v, 3)

        feats = self.reader(
            flat_points, flat_mask, flat_seg, flat_coords, b * v, train
        )  # (B*V, F)
        feats = feats.reshape(b, v, -1)

        return jax.vmap(
            lambda f, co, m: pp_scatter(f, co, m, self.grid_size)
        )(feats, vox["coords"], vox["mask"])

    def __call__(self, example, train: bool = True, return_bev: bool = False):
        canvas = self.encode_canvas(
            example["points"], example["points_mask"], train
        )
        x = self.neck(canvas, train=train)
        out = self.bbox_head(x, train=train)
        if self.seg_head is not None:
            out = dict(out)
            out["seg_preds"] = self.seg_head(canvas, x, train=train)[
                "seg_preds"]
        if return_bev:  # two-stage RoI refinement samples the neck map
            return out, x
        return out


@READERS.register_module(name="PillarFeatureNet")
class PillarFeatureNet(DynamicPFNet):
    """Reference cartesian pillar encoder
    (/root/reference/det3d/models/readers/pillar_encoder.py:73-169):
    raw features + xyz cluster-mean offsets + xy pillar-center offsets
    (+ optional distance), as a dynamic segment implementation — the
    hard-voxelized gather/pad of the reference collapses into the same
    fused point->pillar pass as DynamicPFNet."""

    voxel_shape: str = "cuboid"
    xyz_cluster: bool = True
    xy_center: bool = True
    raz_cluster: bool = False
    ra_center: bool = False


@DETECTORS.register_module(name="PointPillars")
def build_point_pillars(reader, neck, bbox_head, backbone=None,
                        seg_head=None, pretrained=None, train_cfg=None,
                        test_cfg=None, max_pillars=32768):
    """PolarStream-style pillar detector factory (detectors/
    point_pillars.py:5-148 + CenterHead family)."""
    from .detectors import CenterPointDetector, _grid_spec

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

    module = PointPillarsModule(
        reader_cfg=dict(reader),
        neck_cfg={k: v for k, v in dict(neck).items() if k != "logger"},
        head_cfg=head_cfg,
        seg_head_cfg=dict(seg_head) if seg_head else None,
        grid_size=grid,
        pc_range=pc_range,
        voxel_size=voxel_size,
        max_pillars=max_pillars,
        out_size_factor=osf,
    )
    det = CenterPointDetector(
        module,
        code_weights=bbox_head.get("code_weights", [1.0] * 10),
        weight=bbox_head.get("weight", 0.25),
        dataset=bbox_head.get("dataset", "nuscenes"),
        voxel_size=voxel_size,
        test_cfg=dict(test_cfg or {}),
        seg_weight=(seg_head or {}).get("weight", 1.0),
        voxel_shape=bbox_head.get("voxel_shape", "cylinder"),
    )
    det.input_kind = "points"  # PointPillarsModule pillarizes on device
    return det

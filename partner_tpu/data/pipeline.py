"""Data pipeline stages (host side, numpy).

TPU-first re-engineering of /root/reference/det3d/datasets/pipelines/: the
stages keep the reference's registry names and `(res, info)` contract, but
the output of the pipeline is a FIXED-SHAPE example: padded point buffers
(voxelization itself runs fused on device, partner_tpu.ops.voxelize) plus
padded targets. A host hard-voxelization mode is kept for parity testing.

Stage flow (pipelines/loading.py, preprocess.py, voxelization.py,
formating.py):

  LoadPointCloudFromFile -> LoadPointCloudAnnotations -> Preprocess
  (GT-AUG + flip/rot/scale/translate + cart->polar) -> Voxelization
  (grid meta and/or host voxels) -> AssignLabel (center heatmaps, votemap,
  global_box) -> Reformat (data bundle)
"""

import pickle

import numpy as np

from ..core import box_np_ops
from ..core.targets import CenterTargetAssigner, draw_votemap
from ..ops.voxelize import VoxelGenerator
from . import augment
from .gt_aug import DataBaseSampler
from .registry import PIPELINES

NUSCENES_SEMANTIC_MAPPING = {
    1: 0, 5: 0, 7: 0, 8: 0, 10: 0, 11: 0, 13: 0, 19: 0, 20: 0, 0: 0, 29: 0,
    31: 0, 9: 1, 14: 2, 15: 3, 16: 3, 17: 4, 18: 5, 21: 6, 2: 7, 3: 7, 4: 7,
    6: 7, 12: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15,
    30: 16,
}


def get_obj(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def read_file(path, num_point_feature=4):
    return np.fromfile(path, dtype=np.float32).reshape(-1, 5)[
        :, :num_point_feature
    ]


def remove_close(points_t, radius=1.0):
    """points_t: (C, N). Drop points within `radius` box of the origin."""
    close = (np.abs(points_t[0]) < radius) & (np.abs(points_t[1]) < radius)
    return points_t[:, ~close]


def read_sweep(sweep):
    pts = read_file(str(sweep["lidar_path"])).T
    pts = remove_close(pts, 1.0)
    n = pts.shape[1]
    if sweep.get("transform_matrix") is not None:
        pts[:3] = sweep["transform_matrix"].dot(
            np.vstack((pts[:3], np.ones(n)))
        )[:3]
    times = sweep["time_lag"] * np.ones((1, n))
    return pts.T, times.T


def read_single_waymo(obj):
    xyz = obj["lidars"]["points_xyz"]
    feat = obj["lidars"]["points_feature"].copy()
    feat[:, 0] = np.tanh(feat[:, 0])
    return np.concatenate([xyz, feat], axis=-1)


def read_single_waymo_sweep(sweep):
    obj = get_obj(sweep["path"])
    xyz = obj["lidars"]["points_xyz"]
    feat = obj["lidars"]["points_feature"].copy()
    feat[:, 0] = np.tanh(feat[:, 0])
    pts = np.concatenate([xyz, feat], axis=-1).T
    n = pts.shape[1]
    if sweep.get("transform_matrix") is not None:
        pts[:3] = sweep["transform_matrix"].dot(
            np.vstack((pts[:3], np.ones(n)))
        )[:3]
    times = sweep["time_lag"] * np.ones((1, n))
    return pts.T, times.T


@PIPELINES.register_module(name="LoadPointCloudFromFile")
class LoadPointCloudFromFile:
    def __init__(self, dataset="WaymoDataset", **kwargs):
        self.type = dataset
        self.super_tasks = kwargs.get("super_tasks", ["det"])

    def __call__(self, res, info):
        res["type"] = self.type
        nsweeps = res["lidar"]["nsweeps"]
        if self.type == "WaymoDataset":
            if "points" in info:  # pre-materialized (synthetic / test)
                points = info["points"]
            else:
                points = read_single_waymo(get_obj(info["path"]))
            if nsweeps > 1:
                sweep_points = [points]
                sweep_times = [np.zeros((points.shape[0], 1))]
                for sweep in info["sweeps"][: nsweeps - 1]:
                    p, t = read_single_waymo_sweep(sweep)
                    sweep_points.append(p)
                    sweep_times.append(t)
                points = np.concatenate(sweep_points, axis=0)
                times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
                points = np.hstack([points, times])
            res["lidar"]["points"] = points
        elif self.type == "NuScenesDataset":
            if "points" in info:
                points = info["points"]
                times = np.zeros((len(points), 1), points.dtype)
            else:
                points = read_file(str(info["lidar_path"]))
                times = np.zeros((points.shape[0], 1))
            res["lidar"]["n_key_points"] = len(points)
            if nsweeps > 1 and info.get("sweeps"):
                sweep_points = [points]
                sweep_times = [times]
                rng = np.random
                chosen = rng.choice(
                    len(info["sweeps"]), min(nsweeps - 1, len(info["sweeps"])),
                    replace=len(info["sweeps"]) < nsweeps - 1,
                )
                for i in chosen:
                    p, t = read_sweep(info["sweeps"][i])
                    sweep_points.append(p)
                    sweep_times.append(t)
                points = np.concatenate(sweep_points, axis=0)
                times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
            res["lidar"]["points"] = np.hstack([points, times.astype(points.dtype)])
            if ("seg" in self.super_tasks and res["mode"] in ("train", "debug_gt")
                    and "lidarseg_path" in info):
                labels = np.fromfile(
                    info["lidarseg_path"], dtype=np.uint8
                ).reshape(-1, 1)
                labels = np.vectorize(NUSCENES_SEMANTIC_MAPPING.get)(labels)
                pad = np.full((len(points), 1), -1, points.dtype)
                pad[: len(labels)] = labels
                res["lidar"]["points"] = np.hstack([res["lidar"]["points"], pad])
                # tells Preprocess the last column IS a label column — a
                # seg config on label-less infos must not strip a feature
                res["lidar"]["seg_labeled"] = True
        else:
            raise NotImplementedError(self.type)
        return res, info


@PIPELINES.register_module(name="LoadPointCloudAnnotations")
class LoadPointCloudAnnotations:
    def __init__(self, with_bbox=True, **kwargs):
        pass

    def __call__(self, res, info):
        if "gt_boxes" in info:
            boxes = np.asarray(info["gt_boxes"], np.float32)
            boxes[np.isnan(boxes)] = 0
            res["lidar"]["annotations"] = {
                "boxes": boxes,
                "names": np.asarray(info["gt_names"]),
            }
        return res, info


@PIPELINES.register_module(name="Preprocess")
class Preprocess:
    def __init__(self, cfg=None, **kwargs):
        cfg = dict(cfg or {})
        self.mode = cfg.get("mode", "train")
        self.shuffle_points = cfg.get("shuffle_points", False)
        self.voxel_shape = cfg.get("voxel_shape", "cuboid")
        self.class_names = list(cfg.get("class_names", []))
        self.super_tasks = kwargs.get("super_tasks", ["det"])
        self.no_augmentation = cfg.get("no_augmentation", False)
        self.rng = np.random
        if self.mode == "train":
            self.global_rot_noise = cfg.get("global_rot_noise", [0, 0])
            self.global_scale_noise = cfg.get("global_scale_noise", [1, 1])
            self.global_translate_std = cfg.get("global_translate_std", 0)
            db = cfg.get("db_sampler")
            self.db_sampler = None
            if db and db.get("enable", False):
                with open(db["db_info_path"], "rb") as f:
                    db_infos = pickle.load(f)
                self.db_sampler = DataBaseSampler(
                    db_infos, db["sample_groups"],
                    db.get("db_prep_steps"), db.get("rate", 1.0),
                )

    def __call__(self, res, info):
        res["mode"] = self.mode
        points = res["lidar"]["points"]

        if self.mode in ("train", "debug_gt"):
            anno = res["lidar"]["annotations"]
            gt_dict = {
                "gt_boxes": anno["boxes"],
                "gt_names": np.asarray(anno["names"]).reshape(-1),
            }

        if self.mode == "train" and not self.no_augmentation:
            keep = np.array(
                [n not in ("DontCare", "ignore", "UNKNOWN")
                 for n in gt_dict["gt_names"]], bool,
            )
            gt_dict = {k: v[keep] for k, v in gt_dict.items()}

            gt_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]], bool
            )
            if self.db_sampler is not None:
                sampled = self.db_sampler.sample_all(
                    res["metadata"]["image_prefix"],
                    gt_dict["gt_boxes"], gt_dict["gt_names"],
                    res["metadata"]["num_point_features"],
                )
                if sampled is not None:
                    gt_dict["gt_names"] = np.concatenate(
                        [gt_dict["gt_names"], sampled["gt_names"]]
                    )
                    gt_dict["gt_boxes"] = np.concatenate(
                        [gt_dict["gt_boxes"], sampled["gt_boxes"]]
                    )
                    gt_mask = np.concatenate([gt_mask, sampled["gt_masks"]])
                    points = np.concatenate(
                        [sampled["points"][:, : points.shape[1]], points]
                    )
            gt_dict = {k: v[gt_mask] for k, v in gt_dict.items()}
            gt_dict["gt_classes"] = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]],
                np.int32,
            )
            gt_dict["gt_boxes"], points = augment.random_flip_both(
                gt_dict["gt_boxes"], points, rng=self.rng
            )
            gt_dict["gt_boxes"], points = augment.global_rotation(
                gt_dict["gt_boxes"], points, self.global_rot_noise, rng=self.rng
            )
            gt_dict["gt_boxes"], points = augment.global_scaling(
                gt_dict["gt_boxes"], points, *self.global_scale_noise,
                rng=self.rng,
            )
            gt_dict["gt_boxes"], points = augment.global_translate(
                gt_dict["gt_boxes"], points, self.global_translate_std,
                rng=self.rng,
            )
        elif self.mode in ("train", "debug_gt"):
            gt_mask = np.array(
                [n in self.class_names for n in gt_dict["gt_names"]], bool
            )
            gt_dict = {k: v[gt_mask] for k, v in gt_dict.items()}
            gt_dict["gt_classes"] = np.array(
                [self.class_names.index(n) + 1 for n in gt_dict["gt_names"]],
                np.int32,
            )

        if self.shuffle_points:
            self.rng.shuffle(points)

        if self.mode in ("train", "debug_gt"):
            res["lidar"]["annotations"] = gt_dict

        if ("seg" in self.super_tasks and res["mode"] in ("train", "debug_gt")
                and res["lidar"].get("seg_labeled")):
            res["lidar"]["pc_label"] = points[:, -1:].copy()
            points = points[:, :-1]

        res["lidar"]["points"] = box_np_ops.transform_points(
            points, self.voxel_shape
        )
        res["voxel_shape"] = self.voxel_shape
        return res, info


@PIPELINES.register_module(name="Voxelization")
class Voxelization:
    """Records grid metadata; host-voxelizes only in ``hard`` mode.

    In ``device`` (default) mode the padded point buffer flows through and
    the fused device voxelizer runs inside the train/eval step.
    """

    def __init__(self, cfg=None, **kwargs):
        cfg = dict(cfg or {})
        self.range = np.asarray(cfg["range"], np.float32)
        self.voxel_size = np.asarray(cfg["voxel_size"], np.float32)
        self.max_points_in_voxel = cfg.get("max_points_in_voxel", 5)
        mv = cfg.get("max_voxel_num", 150000)
        self.max_voxel_num = mv if isinstance(mv, int) else mv[0]
        self.mode = cfg.get("voxelize_mode", "device")
        self.generator = VoxelGenerator(
            self.voxel_size, self.range, self.max_points_in_voxel,
            self.max_voxel_num,
        )

    def __call__(self, res, info):
        if res.get("mode") in ("train", "debug_gt"):
            anno = res["lidar"]["annotations"]
            if len(anno["gt_boxes"]):
                bv = self.range[[0, 1, 3, 4]]
                if res.get("voxel_shape") == "cuboid":
                    m = box_np_ops.filter_gt_cart_range(anno["gt_boxes"], bv)
                else:
                    m = box_np_ops.filter_gt_polar_range(anno["gt_boxes"], bv)
                res["lidar"]["annotations"] = {
                    k: v[m] for k, v in anno.items()
                }

        meta = dict(
            shape=self.generator.grid_size,
            range=self.range,
            size=self.voxel_size,
        )
        if self.mode == "hard":
            voxels, coords, num_points = self.generator.generate(
                res["lidar"]["points"]
            )
            meta.update(voxels=voxels, coordinates=coords,
                        num_points=num_points,
                        num_voxels=np.array([len(voxels)], np.int64))
        res["lidar"]["voxels"] = meta
        return res, info


def _rotate_boxes(boxes, angle):
    """Rotate cartesian boxes [x, y, z, dims..., (vx, vy,) yaw] by +angle."""
    if not len(boxes):
        return boxes
    out = boxes.copy()
    c, s = np.cos(angle), np.sin(angle)
    out[:, 0] = boxes[:, 0] * c - boxes[:, 1] * s
    out[:, 1] = boxes[:, 0] * s + boxes[:, 1] * c
    if boxes.shape[1] >= 9:  # velocity columns precede yaw
        out[:, -3] = boxes[:, -3] * c - boxes[:, -2] * s
        out[:, -2] = boxes[:, -3] * s + boxes[:, -2] * c
    out[:, -1] = boxes[:, -1] + angle
    return out


@PIPELINES.register_module(name="AssignLabel")
class AssignLabel:
    def __init__(self, cfg=None, rectify=False, with_votemap=True,
                 with_global_box=True, nsectors=1, **kwargs):
        cfg = dict(cfg or {})
        ta = dict(cfg.get("target_assigner", {}))
        self.tasks = [dict(t) for t in ta.get("tasks", [])]
        self.assigner = CenterTargetAssigner(
            tasks=self.tasks,
            out_size_factor=cfg.get("out_size_factor", 8),
            gaussian_overlap=cfg.get("gaussian_overlap", 0.1),
            max_objs=cfg.get("max_objs", 500),
            min_radius=cfg.get("min_radius", 2),
            voxel_shape=cfg.get("voxel_shape", "cylinder"),
            rectify=rectify,
        )
        self.max_objs = cfg.get("max_objs", 500)
        self.with_votemap = with_votemap
        self.with_global_box = with_global_box
        self.nsectors = cfg.get("nsectors", nsectors)

    def _assign_sectors(self, boxes, classes, meta):
        """Per-sector targets: rotate GT into the canonical sector frame and
        assign on the sector grid. Cylinder sectors follow the streaming-
        polar scheme (reference pipelines/voxelization.py:305-393); cuboid
        sectors the streaming-cart scheme (:183-303) — azimuth wedges from
        -pi on the reduced cartesian grid. Targets gain a leading sector
        axis."""
        full_range = np.asarray(meta["range"], np.float32)
        if self.assigner.voxel_shape == "cuboid":
            from ..models.polarstream import cart_sector_spec

            span = 2 * np.pi / self.nsectors
            az_lo = -np.pi
            sec_range, sec_shape = cart_sector_spec(
                full_range, np.asarray(meta["shape"]), self.nsectors)
            sec_range = np.asarray(sec_range, np.float32)
            sec_shape = np.asarray(sec_shape)
        else:
            span = (full_range[4] - full_range[1]) / self.nsectors
            az_lo = full_range[1]
            sec_range = full_range.copy()
            sec_range[4] = sec_range[1] + span
            sec_shape = np.asarray(meta["shape"]).copy()
            sec_shape[1] = sec_shape[1] // self.nsectors

        az = (np.arctan2(boxes[:, 1], boxes[:, 0])
              if len(boxes) else np.zeros((0,)))
        per_sector = []
        for s in range(self.nsectors):
            lo = az_lo + s * span
            m = (az >= lo) & (az < lo + span)
            b = _rotate_boxes(boxes[m], -s * span)
            per_sector.append(self.assigner.assign(
                b, classes[m], sec_shape, meta["size"], sec_range))

        def stack(vals):
            if isinstance(vals[0], (list, tuple)):
                return [stack([v[i] for v in vals])
                        for i in range(len(vals[0]))]
            return np.stack(vals)

        return {k: stack([p[k] for p in per_sector]) for k in per_sector[0]}

    def __call__(self, res, info):
        if res.get("mode") not in ("train", "debug_gt"):
            return res, info
        meta = res["lidar"]["voxels"]
        anno = res["lidar"]["annotations"]
        boxes = anno["gt_boxes"]
        classes = anno["gt_classes"]
        if self.nsectors > 1:
            targets = self._assign_sectors(boxes, classes, meta)
        else:
            targets = self.assigner.assign(
                boxes, classes, meta["shape"], meta["size"], meta["range"]
            )
        if self.with_global_box:
            ncol = boxes.shape[1] if len(boxes) else 7
            gb = np.zeros((self.max_objs, ncol + 1), np.float32)
            m = min(len(boxes), self.max_objs)
            if m:
                gb[:m, :ncol] = boxes[:m]
                gb[:m, -1] = classes[:m]
            targets["global_box"] = gb
        if self.with_votemap:
            n_cls = sum(len(t["class_names"]) for t in self.tasks)
            cls0 = classes - 1 if len(classes) else classes
            targets["votemap"] = draw_votemap(
                boxes[..., [0, 1, 2, 3, 4, 5, -1]] if len(boxes) else boxes,
                cls0, n_cls, meta["shape"], meta["size"], meta["range"],
                feature_map_stride=self.assigner.out_size_factor,
            )
        res["lidar"]["targets"] = targets
        return res, info


@PIPELINES.register_module(name="DoubleFlip")
class DoubleFlip:
    """Test-time y/x/xy point flips for the double-flip TTA
    (/root/reference/det3d/datasets/pipelines/test_aug.py:8-32). Cartesian
    (cuboid) layouts only — the flip configs are cartesian; the decode-side
    averaging lives in models/center_head.double_flip_average."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, res, info):
        pts = res["lidar"]["points"]
        y = pts.copy()
        y[:, 1] = -y[:, 1]
        res["lidar"]["yflip_points"] = y
        x = pts.copy()
        x[:, 0] = -x[:, 0]
        res["lidar"]["xflip_points"] = x
        xy = pts.copy()
        xy[:, 0] = -xy[:, 0]
        xy[:, 1] = -xy[:, 1]
        res["lidar"]["double_flip_points"] = xy
        return res, info


@PIPELINES.register_module(name="Reformat")
class Reformat:
    def __init__(self, double_flip=False, **kwargs):
        self.double_flip = double_flip

    def __call__(self, res, info):
        meta = res.get("metadata")
        if isinstance(meta, dict) and "n_key_points" in res["lidar"]:
            # seg evaluation aligns per-point predictions with the gt
            # label file, which covers only the key frame (sweeps are
            # concatenated after it, loading.py multi-sweep contract)
            meta = dict(meta, n_key_points=res["lidar"]["n_key_points"])
        bundle = dict(metadata=meta)
        voxels = res["lidar"].get("voxels", {})
        bundle["points"] = res["lidar"]["points"]
        bundle["grid_size"] = voxels.get("shape")
        bundle["pc_range"] = voxels.get("range")
        bundle["voxel_size"] = voxels.get("size")
        if "voxels" in voxels:
            bundle.update(
                voxels=voxels["voxels"], coordinates=voxels["coordinates"],
                num_points=voxels["num_points"],
                num_voxels=voxels["num_voxels"],
            )
        if "targets" in res["lidar"]:
            bundle.update(res["lidar"]["targets"])
        if "pc_label" in res["lidar"]:
            bundle["pc_label"] = res["lidar"]["pc_label"]
        if self.double_flip:
            for k in ("yflip_points", "xflip_points", "double_flip_points"):
                if k in res["lidar"]:
                    bundle[k] = res["lidar"][k]
        return bundle, info

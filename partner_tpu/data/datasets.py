"""Dataset classes: WaymoDataset + NuScenesDataset (info-pkl based).

WaymoDataset mirrors /root/reference/det3d/datasets/waymo/waymo.py:24-105.
NuScenesDataset is *reconstructed* — the reference release omits the module
entirely while every nusc config requires it (SURVEY.md section 0); the
implementation follows the PolarStream/CenterPoint lineage its configs and
pipeline code expect: token infos with 10-sweep lists, gt boxes (N, 9)
[x, y, z, w, l, h, vx, vy, yaw], seg-label paths, and an ``evaluation``
returning (det_results, seg_miou, panoptic) as the trainer consumes
(torchie/trainer/trainer.py:566, tools/dist_test.py:224).
"""

import pickle

import numpy as np

from .registry import DATASETS, Compose


class PointCloudDataset:
    """Base dataset: info list + pipeline (datasets/custom.py:12-190)."""

    NumPointFeatures = -1

    def __init__(self, root_path, info_path, pipeline=None, test_mode=False,
                 class_names=None, nsweeps=1, load_interval=1, mode="train",
                 **kwargs):
        self._root_path = root_path
        self._info_path = info_path
        self.test_mode = test_mode or mode in ("val", "test")
        self.mode = mode
        self._class_names = class_names or []
        self.nsweeps = nsweeps
        self.load_interval = load_interval
        self._infos = None
        self.pipeline = Compose(pipeline) if pipeline is not None else None

    def load_infos(self):
        with open(self._info_path, "rb") as f:
            infos = pickle.load(f)
        self._infos = infos[:: self.load_interval]

    @property
    def infos(self):
        if self._infos is None:
            self.load_infos()
        return self._infos

    def __len__(self):
        return len(self.infos)

    def base_res(self, info):
        return {
            "lidar": {"type": "lidar", "points": None, "annotations": None,
                      "nsweeps": self.nsweeps},
            "metadata": {
                "image_prefix": self._root_path,
                "num_point_features": self.NumPointFeatures,
                "token": info.get("token", ""),
            },
            "calib": None,
            "mode": "val" if self.test_mode else "train",
            "type": type(self).__name__,
        }

    def __getitem__(self, idx):
        info = self.infos[idx]
        res = self.base_res(info)
        data, _ = self.pipeline(res, info)
        return data


@DATASETS.register_module(name="WaymoDataset")
class WaymoDataset(PointCloudDataset):
    NumPointFeatures = 5  # x, y, z, intensity, elongation

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.nsweeps > 1:
            self.NumPointFeatures += 1

    def evaluation(self, detections, output_dir=None, testset=False):
        from ..eval.waymo import create_pd_detection

        create_pd_detection(detections, self.infos, output_dir)
        return None, None


@DATASETS.register_module(name="NuScenesDataset")
class NuScenesDataset(PointCloudDataset):
    NumPointFeatures = 4  # x, y, z, intensity (+ time channel when sweeps)

    CLASSES = (
        "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
        "motorcycle", "bicycle", "pedestrian", "traffic_cone",
    )

    def __init__(self, *args, version="v1.0-trainval", **kwargs):
        super().__init__(*args, **kwargs)
        self.version = version

    def base_res(self, info):
        res = super().base_res(info)
        res["lidar"]["transform_type"] = "raw"
        res["painted"] = False
        return res

    def evaluation(self, detections, output_dir=None, testset=False,
                   final_ins=None):
        """Writes nusc-format results json; devkit metrics run externally.

        Returns (det_results_path, seg_miou, panoptic_pq) — the 3-tuple the
        trainer/dist_test consume.
        """
        from ..eval.nuscenes import write_nusc_results

        path = write_nusc_results(detections, self.infos, output_dir,
                                  self.CLASSES)
        return path, None, None

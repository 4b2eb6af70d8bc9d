"""Waymo CenterPoint-Pillar two-stage, two-class variant.

Port of /root/reference/configs/waymo/pp/two_stage/
waymo_centerpoint_pp_two_cls_two_pfn_stride1_two_stage_bev_6epoch.py —
the two-stage pillar config over the VEHICLE+PEDESTRIAN one-stage
(reference diff: task list + pretrained path)."""

import os

with open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_6epoch.py")) as _f:
    exec(_f.read())

import itertools

tasks = [dict(num_class=2, class_names=["VEHICLE", "PEDESTRIAN"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
target_assigner = dict(tasks=tasks)
bbox_head = dict(bbox_head)
bbox_head["tasks"] = tasks
first_stage_cfg = dict(first_stage_cfg)
first_stage_cfg["bbox_head"] = bbox_head
first_stage_cfg["pretrained"] = \
    "work_dirs/waymo_centerpoint_pp_two_cls_two_pfn_stride1_3x/latest"
model = dict(model)
model["first_stage_cfg"] = first_stage_cfg
assigner = dict(assigner, target_assigner=target_assigner)
train_cfg = dict(assigner=assigner)
work_dir = ("./work_dirs/"
            "waymo_centerpoint_pp_two_cls_two_pfn_stride1_two_stage_bev_6epoch/")

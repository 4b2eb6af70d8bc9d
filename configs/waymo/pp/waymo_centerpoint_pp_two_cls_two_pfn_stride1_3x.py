"""Waymo CenterPoint-Pillar two-class variant (VEHICLE + PEDESTRIAN).

Port of /root/reference/configs/waymo/pp/
waymo_centerpoint_pp_two_cls_two_pfn_stride1_3x.py — identical to the
3-class config except the task list (reference diff: num_class 2)."""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "waymo_centerpoint_pp_two_pfn_stride1_3x.py")) as _f:
    exec(_f.read())

import itertools

tasks = [dict(num_class=2, class_names=["VEHICLE", "PEDESTRIAN"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
target_assigner = dict(tasks=tasks)
bbox_head = dict(bbox_head)
bbox_head["tasks"] = tasks
model = dict(model)
model["bbox_head"] = bbox_head
assigner = dict(assigner, target_assigner=target_assigner)
train_cfg = dict(assigner=assigner)
work_dir = "./work_dirs/waymo_centerpoint_pp_two_cls_two_pfn_stride1_3x/"

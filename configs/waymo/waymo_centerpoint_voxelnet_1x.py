"""Waymo CenterPoint-Voxel one-stage, 1x (12 epoch) schedule.

Port of /root/reference/configs/waymo/voxelnet/
waymo_centerpoint_voxelnet_1x.py — identical to the 36-epoch (3x) config
except total_epochs (reference diff: total_epochs 12 vs 36)."""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "waymo_centerpoint_voxelnet_36epoch.py")) as _f:
    exec(_f.read())

total_epochs = 12
work_dir = "./work_dirs/waymo_centerpoint_voxelnet_1x/"

"""Waymo CenterPoint-Voxel one-stage, 3-epoch schedule.

Port of /root/reference/configs/waymo/voxelnet/
waymo_centerpoint_voxelnet_3epoch.py (schedule-only variant of the 3x
config; reference zoo mAPH 60.7 @ 7 hr, configs/waymo/README.md:21-30)."""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "waymo_centerpoint_voxelnet_36epoch.py")) as _f:
    exec(_f.read())

total_epochs = 3
work_dir = "./work_dirs/waymo_centerpoint_voxelnet_3epoch/"

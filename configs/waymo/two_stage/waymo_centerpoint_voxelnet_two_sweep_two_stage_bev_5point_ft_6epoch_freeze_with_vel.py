"""Waymo CenterPoint-Voxel two-sweep two-stage — RoI fine-tune with
velocity head, frozen first stage.

Port of /root/reference/configs/waymo/voxelnet/two_stage/
waymo_centerpoint_voxelnet_two_sweep_two_stage_bev_5point_ft_6epoch_
freeze_with_vel.py: like the single-sweep two-stage fine-tune but wrapping
the two-sweep + vel first stage (reference zoo: 70.3 val mAPH,
configs/waymo/README.md:41-50).
"""

import os

with open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "waymo_centerpoint_voxelnet_two_stage_bev_5point_ft_6epoch_freeze.py"
)) as _f:
    exec(_f.read())

_two_sweeps = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo.py")
with open(_two_sweeps) as _f:
    _ns = {"__file__": _two_sweeps, "os": os}
    exec(_f.read(), _ns)

first_stage_cfg = dict(_ns["model"])
first_stage_cfg["pretrained"] = \
    "work_dirs/waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo/latest"
model = dict(model)
model["first_stage_cfg"] = first_stage_cfg
bbox_head = _ns["bbox_head"]
voxel_generator = _ns["voxel_generator"]
nsweeps = _ns["nsweeps"]
data = _ns["data"]
del _ns

total_epochs = 6
work_dir = ("./work_dirs/waymo_centerpoint_voxelnet_two_sweep_two_stage_"
            "bev_5point_ft_6epoch_freeze_with_vel/")

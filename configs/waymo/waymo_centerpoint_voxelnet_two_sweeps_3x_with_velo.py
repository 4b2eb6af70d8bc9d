"""Waymo CenterPoint-Voxel two-sweep with velocity head, 3x schedule.

Port of /root/reference/configs/waymo/voxelnet/
waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo.py: two aggregated
sweeps (per-point time-lag channel), a 'vel' head branch, and velocity
code weights 0.2 (reference diff vs the 3x config: num_input_features +1,
common_heads + vel:(2,2), code_weights [..,0.2,0.2,1,1], nsweeps=2)."""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "waymo_centerpoint_voxelnet_36epoch.py")) as _f:
    exec(_f.read())

nsweeps = 2

# +1 input channel: per-point time lag of the aggregated second sweep
model["reader"]["num_input_features"] = 8
model["backbone"]["num_input_features"] = 8

bbox_head["code_weights"] = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2,
                             1.0, 1.0]
bbox_head["common_heads"] = {"reg": (2, 2), "height": (1, 2),
                             "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)}
model["bbox_head"] = bbox_head

train_anno = "data/waymo/infos_train_02sweeps_filter_zero_gt.pkl"
val_anno = "data/waymo/infos_val_02sweeps_filter_zero_gt.pkl"
for _split, _anno in (("train", train_anno), ("val", val_anno)):
    data[_split]["info_path"] = _anno
    data[_split]["ann_file"] = _anno
    data[_split]["nsweeps"] = nsweeps

total_epochs = 36
work_dir = "./work_dirs/waymo_centerpoint_voxelnet_two_sweeps_3x_with_velo/"

"""nuScenes CenterPoint, plain separate heads, 0.1-equivalent voxels.

Port of /root/reference/configs/nusc/voxelnet/
nusc_centerpoint_voxelnet_01voxel.py — the DCN config's plain-SepHead
sibling at the coarser grid (reference: 0.1 m cuboid; here the cylinder
equivalent 512 x 512 x 40, dcn_head=False)."""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "nusc_centerpoint_voxelnet_dcn.py")) as _f:
    exec(_f.read())

voxel_generator = dict(voxel_generator)
voxel_generator["voxel_size"] = [0.098, 0.0123, 0.2]  # grid 512 x 512 x 40
voxel_generator["max_points_in_voxel"] = 10
grid_size = [512, 512, 40]

bbox_head = dict(bbox_head)
bbox_head["dcn_head"] = False
bbox_head["voxel_generator"] = voxel_generator
model = dict(model)
model["bbox_head"] = bbox_head

test_cfg = dict(test_cfg)
test_cfg["voxel_size"] = voxel_generator["voxel_size"]
work_dir = "./work_dirs/nusc_centerpoint_voxelnet_01voxel/"

"""nuScenes lidarseg — segmentation-only VoxelNet on the cylinder grid.

Port of /root/reference/configs/nusc/voxelnet/voxelnet_seg_cylinder.py:
super_tasks=['seg'], bbox_head=None, dynamic voxel encoder, cylinder grid
640 x 640 x 40 (0.079 m, 0.00984 rad, 0.2 m).
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "voxelnet_seg_10sweep.py")) as _f:
    exec(_f.read())

voxel_generator = dict(
    range=[0.3, -3.1488, -5.0, 50.86, 3.1488, 3.0],
    voxel_size=[0.079, 0.00984, 0.2],  # grid 640 x 640 x 40
    max_points_in_voxel=30,
    max_voxel_num=[120000, 180000],
    voxel_shape="cylinder",
)

seg_head = dict(seg_head)
seg_head["voxel_generator"] = voxel_generator
seg_head["voxel_shape"] = voxel_generator["voxel_shape"]
model = dict(model)
model["reader"] = dict(type="DynamicVoxelEncoderV1", num_input_features=7)
model["backbone"] = dict(type="SpMiddleResNetFHD", num_input_features=7,
                         ds_factor=8, extra_sp_shape=[0, 0, 0])
model["seg_head"] = seg_head

assigner = dict(assigner, voxel_shape=voxel_generator["voxel_shape"])
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    test_cfg,
    pc_range=voxel_generator["range"],
    voxel_size=voxel_generator["voxel_size"],
)
for _p in (train_preprocessor, val_preprocessor):
    _p["voxel_shape"] = voxel_generator["voxel_shape"]
train_pipeline[3] = dict(type="Voxelization", cfg=voxel_generator)
test_pipeline[3] = dict(type="Voxelization", cfg=voxel_generator)
work_dir = "./work_dirs/voxelnet_seg_cylinder/"

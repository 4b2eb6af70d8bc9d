"""nuScenes CenterPoint-DCN, cartesian 0.075 grid, double-flip TTA.

Port of /root/reference/configs/nusc/voxelnet/
nusc_centerpoint_voxelnet_0075voxel_dcn_flip.py: the cartesian
1440 x 1440 x 40 grid (0.075 m voxels) with DCN separate heads and
double_flip=True — at test time each frame is fed as 4 copies
[orig, yflip, xflip, xyflip]; the head maps are de-flipped and averaged
before decode (reference center_head.py:290-348). The flip TTA is a
cartesian-grid operation (y-flip = H-flip, x-flip = W-flip), which is why
this config keeps the reference's cuboid grid rather than the cylinder
grid of the non-flip DCN port.
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "nusc_centerpoint_voxelnet_dcn.py")) as _f:
    exec(_f.read())

DOUBLE_FLIP = True

voxel_generator = dict(
    range=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
    voxel_size=[0.075, 0.075, 0.2],  # grid 1440 x 1440 x 40
    max_points_in_voxel=10,
    max_voxel_num=[120000, 160000],
    dynamic=True,
    voxel_shape="cuboid",
    nsectors=1,
)
grid_size = [1440, 1440, 40]

bbox_head = dict(bbox_head)
bbox_head["voxel_shape"] = voxel_generator["voxel_shape"]
bbox_head["voxel_generator"] = voxel_generator
model = dict(model)
model["reader"] = dict(type="VoxelFeatureExtractorV3", num_input_features=5)
model["backbone"] = dict(type="PolarDenseFHD", num_input_features=5,
                         ds_factor=8)
model["bbox_head"] = bbox_head

assigner = dict(assigner, voxel_shape=voxel_generator["voxel_shape"])
train_cfg = dict(assigner=assigner)

test_cfg = dict(test_cfg)
test_cfg["double_flip"] = DOUBLE_FLIP
test_cfg["pc_range"] = voxel_generator["range"]
test_cfg["voxel_size"] = voxel_generator["voxel_size"]

for _p in (train_preprocessor, val_preprocessor):
    _p["voxel_shape"] = voxel_generator["voxel_shape"]
test_pipeline = list(test_pipeline)
test_pipeline[3] = dict(type="Voxelization", cfg=voxel_generator)
test_pipeline.insert(4, dict(type="DoubleFlip"))
test_pipeline[-1] = dict(type="Reformat", double_flip=DOUBLE_FLIP)
train_pipeline = list(train_pipeline)
train_pipeline[3] = dict(type="Voxelization", cfg=voxel_generator)
# re-point the data dicts at the REBUILT pipelines — the base config's
# data still references its own lists, which lack the DoubleFlip stage
data = dict(data)
data["train"] = dict(data["train"], pipeline=train_pipeline)
data["val"] = dict(data["val"], pipeline=test_pipeline)
work_dir = "./work_dirs/nusc_centerpoint_voxelnet_dcn_flip/"

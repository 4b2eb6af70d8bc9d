"""HAN method, 4 sectors — cartesian sector-streaming LSTM pillars.

Port of /root/reference/configs/nusc/pp/han_method/han_4_sectors.py:
the han_1_sector det+seg model streamed over 4 cartesian azimuth wedges
(voxelize_streaming_cart reduced-grid scheme) with the ConvLSTM-memory
neck (PointPillarsLSTMV1 + RPNWaymo) and stateful cross-sector NMS.
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "han_1_sector.py")) as _f:
    exec(_f.read())

voxel_generator = dict(voxel_generator)
voxel_generator["nsectors"] = 4

bbox_head = dict(bbox_head)
bbox_head["voxel_generator"] = voxel_generator
model = dict(model)
model["type"] = "PointPillarsLSTMV1"
model["neck"] = dict(
    type="RPNWaymo",
    layer_nums=[3, 5, 5],
    ds_layer_strides=[2, 2, 2],
    ds_num_filters=[128, 128, 256],
    us_layer_strides=[0.5, 1, 2],
    us_num_filters=[128, 128, 128],
    num_input_features=128,
)
model["bbox_head"] = bbox_head

assigner = dict(assigner, nsectors=voxel_generator["nsectors"])
train_cfg = dict(assigner=assigner)
test_cfg = dict(test_cfg)
test_cfg["stateful_nms"] = True
test_cfg["interval"] = voxel_generator["nsectors"]
work_dir = "./work_dirs/han_4_sectors/"

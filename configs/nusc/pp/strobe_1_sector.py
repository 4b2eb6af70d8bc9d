"""STROBE, 1 sector — cartesian det+seg pillars with previous-sweep carry.

Port of /root/reference/configs/nusc/pp/strobe/strobe_1_sector.py:
cuboid 512 x 512 pillar grid, DynamicPFNet, RPNUber neck concatenating
each block's input with the previous sweep's features at the same scale
(det3d/models/detectors/strobe_uber.py:12-278), CenterHeadSingle +
SingleConvHead det+seg.

Batch contract (TPU fixed shapes): points (B, S, P, C) sweeps
oldest->current; detection and segmentation run on the current sweep.
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "han_1_sector.py")) as _f:
    exec(_f.read())

model = dict(model)
model["type"] = "STROBE"
model["neck"] = dict(
    type="RPNUber",
    layer_nums=[3, 5, 5],
    ds_layer_strides=[2, 2, 2],
    ds_num_filters=[128, 128, 256],
    us_layer_strides=[0.5, 1, 2],
    us_num_filters=[128, 128, 128],
    num_input_features=128,
)
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
work_dir = "./work_dirs/strobe_1_sector/"

"""STROBE, 4 sectors — cartesian sector streaming with previous-sweep
context per sector.

Port of /root/reference/configs/nusc/pp/strobe/strobe_4_sector.py: the
strobe_1_sector det+seg model over 4 cartesian azimuth wedges; the
RPNUber neck concatenates each sector's features with the SAME sector's
features from the previous sweep (strobe_uber.py sector batches),
stateful cross-sector NMS at test time.
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "strobe_1_sector.py")) as _f:
    exec(_f.read())

voxel_generator = dict(voxel_generator)
voxel_generator["nsectors"] = 4

bbox_head = dict(bbox_head)
bbox_head["voxel_generator"] = voxel_generator
model = dict(model)
model["bbox_head"] = bbox_head
model["nsectors"] = voxel_generator["nsectors"]

assigner = dict(assigner, nsectors=voxel_generator["nsectors"])
train_cfg = dict(assigner=assigner)
test_cfg = dict(test_cfg)
test_cfg["stateful_nms"] = True
test_cfg["interval"] = voxel_generator["nsectors"]
work_dir = "./work_dirs/strobe_4_sector/"

"""PolarStream 4-sector trailing-edge — streaming polar pillars.

Port of /root/reference/configs/nusc/pp/polarstream/
polarstream_det_n_seg_4_sector_trailing_edge.py: same det+seg model as
the bidirectional variant but with the trailing-edge-context-padding neck
(RPNTECP caches each conv's last rows for the next sector; no
previous-sweep leading-edge features) — reference diff vs bidirectional:
RPNTECP for RPNBDCP, lr_max 0.0075.
"""

import os

with open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "polarstream_det_n_seg_4_sector_bidirectional.py")) as _f:
    exec(_f.read())

model["neck"]["type"] = "RPNTECP"
lr_config = dict(type="one_cycle", lr_max=0.0075, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
work_dir = "./work_dirs/polarstream_det_n_seg_4_sector_trailing_edge/"

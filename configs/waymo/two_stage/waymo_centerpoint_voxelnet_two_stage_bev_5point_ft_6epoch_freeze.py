"""Waymo CenterPoint-Voxel two-stage — BEV 5-point RoI fine-tune, frozen
first stage.

Port of /root/reference/configs/waymo/voxelnet/two_stage/
waymo_centerpoint_voxelnet_two_stage_bev_5point_ft_6epoch_freeze.py:
TwoStageDetector wrapping the one-stage CenterPoint-Voxel, BEVFeature-
Extractor sampling 5 points per proposal from the stride-8 BEV map,
RoIHead with shared 256-256 FCs, 6-epoch fine-tune with the first stage
frozen (reference zoo: 67.4 val mAPH, configs/waymo/README.md:32-39).
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "waymo_centerpoint_voxelnet_36epoch.py")) as _f:
    exec(_f.read())

first_stage_cfg = dict(model)
first_stage_cfg["pretrained"] = \
    "work_dirs/waymo_centerpoint_voxelnet_36epoch/latest"

model = dict(
    type="TwoStageDetector",
    first_stage_cfg=first_stage_cfg,
    second_stage_modules=[
        dict(
            type="BEVFeatureExtractor",
            pc_start=voxel_generator["range"][:2],
            voxel_size=voxel_generator["voxel_size"][:2],
            out_stride=8,
        )
    ],
    roi_head=dict(
        type="RoIHead",
        input_channels=512 * 5,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[256, 256],
            CLS_FC=[256, 256],
            REG_FC=[256, 256],
            DP_RATIO=0.3,
            TARGET_CONFIG=dict(
                ROI_PER_IMAGE=128, FG_RATIO=0.5,
                SAMPLE_ROI_BY_EACH_CLASS=True, CLS_SCORE_TYPE="roi_iou",
                CLS_FG_THRESH=0.75, CLS_BG_THRESH=0.25,
                CLS_BG_THRESH_LO=0.1, HARD_BG_RATIO=0.8,
                REG_FG_THRESH=0.55,
            ),
            LOSS_CONFIG=dict(
                CLS_LOSS="BinaryCrossEntropy", REG_LOSS="L1",
                LOSS_WEIGHTS={"rcnn_cls_weight": 1.0,
                              "rcnn_reg_weight": 1.0,
                              "code_weights": [1.0] * 7},
            ),
        ),
        code_size=7,
    ),
    NMS_POST_MAXSIZE=500,
    num_point=5,
    freeze=True,
)

total_epochs = 6
work_dir = ("./work_dirs/"
            "waymo_centerpoint_voxelnet_two_stage_bev_5point_ft_6epoch_freeze/")

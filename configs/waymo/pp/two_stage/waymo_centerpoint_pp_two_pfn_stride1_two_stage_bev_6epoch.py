"""Waymo CenterPoint-Pillar two-stage — BEV RoI refinement, 6 epochs.

Port of /root/reference/configs/waymo/pp/two_stage/
waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_6epoch.py:
TwoStageDetector wrapping the stride-1 pillar one-stage, 5-point BEV
feature extraction at out_stride 1 (reference zoo: 61.4 val mAPH,
configs/waymo/README.md:53-58).
"""

import os

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "waymo_centerpoint_pp_two_pfn_stride1_3x.py")) as _f:
    exec(_f.read())

first_stage_cfg = dict(model)
first_stage_cfg["pretrained"] = \
    "work_dirs/waymo_centerpoint_pp_two_pfn_stride1_3x/latest"

model = dict(
    type="TwoStageDetector",
    first_stage_cfg=first_stage_cfg,
    second_stage_modules=[
        dict(
            type="BEVFeatureExtractor",
            pc_start=voxel_generator["range"][:2],
            voxel_size=voxel_generator["voxel_size"][:2],
            out_stride=1,
        )
    ],
    roi_head=dict(
        type="RoIHead",
        input_channels=128 * 3 * 5,
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
            "waymo_centerpoint_pp_two_pfn_stride1_two_stage_bev_6epoch/")

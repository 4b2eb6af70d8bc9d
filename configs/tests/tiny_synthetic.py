"""Tiny synthetic config for CI/CPU end-to-end drives of the CLIs."""

import os

_here = os.path.dirname(os.path.abspath(__file__))
_data_root = os.environ.get("TINY_DATA_ROOT", "/tmp/partner_tiny_data")

pc_range = [0.3, -3.14368, -2.0, 36.3, 3.14368, 2.8]
grid = [64, 128, 24]
voxel_size = [
    (pc_range[3] - pc_range[0]) / grid[0],
    (pc_range[4] - pc_range[1]) / grid[1],
    (pc_range[5] - pc_range[2]) / grid[2],
]

voxel_generator = dict(
    range=pc_range, voxel_size=voxel_size, max_points_in_voxel=5,
    max_voxel_num=8192, voxel_shape="cylinder", nsectors=1,
)

tasks = [dict(num_class=1, class_names=["Vehicle"])]
class_names = ["Vehicle"]

model = dict(
    type="VoxelNetV3",
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5),
    neck=dict(
        type="RPN", layer_nums=[2, 2], ds_layer_strides=[1, 2],
        ds_num_filters=[32, 64], us_layer_strides=[1, 2],
        us_num_filters=[32, 32], num_input_features=32,
        set_depth=2, set_h=2, set_w=8,
    ),
    bbox_head=dict(
        type="E2ESWVoteHead",
        in_channels=64,
        voxel_generator=voxel_generator,
        out_size_factor=8,
        voxel_shape="cylinder",
        SET_CRIT_CONFIG={
            "weight_dict": {"loss_ce": 1, "loss_bbox": 2, "loss_vote": 0.25,
                            "loss_vote_cls": 1, "loss_iou": 2},
            "losses": ["loss_ce", "loss_bbox", "loss_vote", "loss_vote_cls",
                       "loss_iou"],
            "sigma": 3.0, "code_weights": [1.0] * 8,
        },
        CODER_CONFIG={"code_size": 7, "encode_angle_by_sincos": True},
        MATCHER_CONFIG={"weight_dict": {"loss_ce": 0.25, "loss_bbox": 0.75}},
        HEAD_CONFIG={"kernel_size": 3, "window_size": 4, "sl_depth": [2],
                     "iou_loss": True, "iou_factor": 1, "init_bias": -2.19,
                     "num_classes": 1},
    ),
)

assigner = dict(
    target_assigner=dict(tasks=tasks), out_size_factor=8,
    gaussian_overlap=0.1, max_objs=32, min_radius=2,
    voxel_shape="cylinder",
)
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    post_center_limit_range=[-40, -40, -5, 40, 40, 5],
    nms=dict(nms_pre_max_size=256, nms_post_max_size=16,
             nms_iou_threshold=0.7),
    score_threshold=0.1,
)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="WaymoDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=dict(
        mode="train", shuffle_points=True,
        global_rot_noise=[-0.3, 0.3], global_scale_noise=[0.95, 1.05],
        db_sampler=dict(enable=False), class_names=class_names,
        voxel_shape="cylinder",
    )),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignLabel", cfg=assigner),
    dict(type="Reformat"),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="WaymoDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=dict(
        mode="val", shuffle_points=False, class_names=class_names,
        voxel_shape="cylinder",
    )),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="Reformat"),
]

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(type="WaymoDataset", root_path=_data_root,
               info_path=os.path.join(_data_root, "infos_train.pkl"),
               nsweeps=1, class_names=class_names, pipeline=train_pipeline),
    val=dict(type="WaymoDataset", root_path=_data_root,
             info_path=os.path.join(_data_root, "infos_val.pkl"),
             nsweeps=1, class_names=class_names, pipeline=test_pipeline,
             mode="val"),
)

optimizer = dict(type="adam", wd=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35))
lr_config = dict(type="one_cycle", lr_max=1e-3, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
checkpoint_config = dict(interval=1, keep=2)
log_config = dict(interval=1,
                  hooks=[dict(type="TextLoggerHook"),
                         dict(type="PaviLoggerHook")])
total_epochs = 1
work_dir = "/tmp/partner_tiny_workdir"

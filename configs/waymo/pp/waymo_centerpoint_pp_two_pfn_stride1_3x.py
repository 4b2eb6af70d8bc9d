"""Waymo CenterPoint-Pillar, two-PFN, stride-1 head, 3x schedule.

Port of /root/reference/configs/waymo/pp/
waymo_centerpoint_pp_two_pfn_stride1_3x.py: cartesian 468 x 468 pillar
grid (0.32 m), two-layer PillarFeatureNet, RPN with a stride-1 output
head (reference zoo: 60.3 val mAPH @ 19 FPS, configs/waymo/README.md:53-58).
"""

import itertools

nsweeps = 1

voxel_generator = dict(
    range=[-74.88, -74.88, -2, 74.88, 74.88, 4.0],
    voxel_size=[0.32, 0.32, 6.0],  # pillars: grid 468 x 468 x 1
    max_points_in_voxel=20,
    max_voxel_num=[32000, 60000],
    voxel_shape="cuboid",
)

tasks = [dict(num_class=3,
              class_names=["VEHICLE", "PEDESTRIAN", "CYCLIST"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
target_assigner = dict(tasks=tasks)

bbox_head = dict(
    type="CenterHead",
    in_channels=128 * 3,
    tasks=tasks,
    dataset="waymo",
    weight=2,
    code_weights=[1.0] * 8,
    common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                  "rot": (2, 2)},
    voxel_shape=voxel_generator["voxel_shape"],
    voxel_generator=voxel_generator,
    out_size_factor=1,
)

model = dict(
    type="PointPillars",
    pretrained=None,
    reader=dict(
        type="PillarFeatureNet",
        num_filters=[64, 64],
        num_input_features=5,
        with_distance=False,
        voxel_size=(0.32, 0.32, 6.0),
        pc_range=(-74.88, -74.88, -2, 74.88, 74.88, 4.0),
    ),
    backbone=dict(type="PointPillarsScatter", ds_factor=1),
    neck=dict(
        type="RPN",
        layer_nums=[3, 5, 5],
        ds_layer_strides=[1, 2, 2],
        ds_num_filters=[64, 128, 256],
        us_layer_strides=[1, 2, 4],
        us_num_filters=[128, 128, 128],
        num_input_features=64,
    ),
    bbox_head=bbox_head,
)

assigner = dict(
    target_assigner=target_assigner, out_size_factor=1, dense_reg=1,
    gaussian_overlap=0.1, max_objs=500, min_radius=2,
    voxel_shape=voxel_generator["voxel_shape"],
)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-80, -80, -10.0, 80, 80, 10.0],
    nms=dict(nms_pre_max_size=4096, nms_post_max_size=500,
             nms_iou_threshold=0.7),
    score_threshold=0.1,
    pc_range=voxel_generator["range"],
    out_size_factor=1,
    voxel_size=voxel_generator["voxel_size"],
)

dataset_type = "WaymoDataset"
data_root = "data/waymo"

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05], db_sampler=None,
    class_names=class_names, voxel_shape=voxel_generator["voxel_shape"],
)
val_preprocessor = dict(
    mode="val", shuffle_points=False,
    voxel_shape=voxel_generator["voxel_shape"], class_names=class_names,
)
train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignLabel", cfg=train_cfg["assigner"]),
    dict(type="Reformat"),
]
test_pipeline = list(train_pipeline)
test_pipeline[2] = dict(type="Preprocess", cfg=val_preprocessor)

train_anno = "data/waymo/infos_train_01sweeps_filter_zero_gt.pkl"
val_anno = "data/waymo/infos_val_01sweeps_filter_zero_gt.pkl"
data = dict(
    samples_per_gpu=4, workers_per_gpu=8,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               ann_file=train_anno, nsweeps=nsweeps, class_names=class_names,
               pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno,
             ann_file=val_anno, nsweeps=nsweeps, class_names=class_names,
             pipeline=test_pipeline),
)

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True,
                 moving_average=False)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
checkpoint_config = dict(interval=1)
log_config = dict(interval=5, hooks=[dict(type="TextLoggerHook")])
total_epochs = 36
log_level = "INFO"
work_dir = "./work_dirs/waymo_centerpoint_pp_two_pfn_stride1_3x/"
load_from = None
resume_from = None
workflow = [("train", 1)]

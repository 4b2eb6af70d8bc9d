"""nuScenes lidarseg — segmentation-only VoxelNet, 10-sweep cuboid grid.

Port of /root/reference/configs/nusc/voxelnet/voxelnet_seg_10sweep.py:
super_tasks=['seg'], bbox_head=None, DeconvConvHead over the 3D middle
extractor (grid 512 x 512 x 40 at 0.2 m voxels).
"""

import itertools

super_tasks = ["seg"]
nsweeps = 10

voxel_generator = dict(
    range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    voxel_size=[0.2, 0.2, 0.2],  # grid 512 x 512 x 40
    max_points_in_voxel=30,
    max_voxel_num=[120000, 180000],
    voxel_shape="cuboid",
)

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["truck", "construction_vehicle"]),
    dict(num_class=2, class_names=["bus", "trailer"]),
    dict(num_class=1, class_names=["barrier"]),
    dict(num_class=2, class_names=["motorcycle", "bicycle"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
target_assigner = dict(tasks=tasks)

bbox_head = None
seg_head = dict(
    type="DeconvConvHead",
    num_classes=16,
    in_channels=512,
    in_channels_voxel=16,
    up_scale=8,
    loss=dict(type="SegLoss", ignore=-1),
    weight=1,
    height=40,
    # grid spec source when bbox_head is None (build_voxelnet contract)
    voxel_generator=voxel_generator,
    voxel_shape=voxel_generator["voxel_shape"],
    out_size_factor=8,
)

model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5,
                  ds_factor=8, extra_sp_shape=[0, 0, 0]),
    neck=dict(
        type="RPN", layer_nums=[5, 5], ds_layer_strides=[1, 2],
        ds_num_filters=[128, 256], us_layer_strides=[1, 2],
        us_num_filters=[256, 256], num_input_features=128,
    ),
    bbox_head=bbox_head,
    seg_head=seg_head,
)

assigner = dict(
    target_assigner=target_assigner, out_size_factor=8,
    gaussian_overlap=0.1, max_objs=500, min_radius=2,
    voxel_shape=voxel_generator["voxel_shape"],
)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    nms=dict(nms_pre_max_size=1000, nms_post_max_size=83,
             nms_iou_threshold=0.2),
    score_threshold=0.1,
    pc_range=voxel_generator["range"],
    out_size_factor=8,
    voxel_size=voxel_generator["voxel_size"],
)

dataset_type = "NuScenesDataset"
data_root = "data/nuScenes"

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
    dict(type="LoadPointCloudFromFile", dataset=dataset_type,
         super_tasks=super_tasks),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor,
         super_tasks=super_tasks),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignLabel", cfg=train_cfg["assigner"]),
    dict(type="Reformat"),
]
test_pipeline = list(train_pipeline)
test_pipeline[2] = dict(type="Preprocess", cfg=val_preprocessor,
                        super_tasks=super_tasks)

train_anno = "data/nuScenes/infos_train_%02dsweeps_withvelo_filter_True.pkl" % nsweeps
val_anno = "data/nuScenes/infos_val_%02dsweeps_withvelo_filter_True.pkl" % nsweeps
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
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
checkpoint_config = dict(interval=1)
log_config = dict(interval=5, hooks=[dict(type="TextLoggerHook")])
total_epochs = 20
log_level = "INFO"
work_dir = "./work_dirs/voxelnet_seg_10sweep/"
load_from = None
resume_from = None
workflow = [("train", 1)]

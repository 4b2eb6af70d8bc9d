"""nuScenes CenterPoint with DCN separate heads.

Cylinder-grid adaptation of
/root/reference/configs/nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_dcn.py:
the six CenterPoint task groups, each with a DCNSepHead — two deformable-
conv FeatureAdaption branches feeding the heatmap and regression heads
(det3d/models/bbox_heads/center_head.py:111-163). The deformable conv is
the TPU bilinear-gather kernel (partner_tpu/ops/deform_conv.py).
"""

import itertools

super_tasks = ["det"]
nsweeps = 10
rectify = False

voxel_generator = dict(
    range=[0.3, -3.1488, -5.0, 50.476, 3.1488, 3.0],
    voxel_size=[0.098 / 2, 0.0123 / 2, 0.2],  # grid 1024 x 1024 x 40
    max_points_in_voxel=10,
    max_voxel_num=[120000, 160000],
    dynamic=True,
    voxel_shape="cylinder",
    nsectors=1,
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
grid_size = [1024, 1024, 40]

bbox_head = dict(
    type="CenterHead",
    in_channels=sum([256, 256]),
    tasks=tasks,
    dataset="nuscenes",
    weight=0.25,
    code_weights=[1.0, 1.0, 0.2, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                  "rot": (2, 2), "vel": (2, 2)},
    share_conv_channel=64,
    dcn_head=True,
    voxel_shape=voxel_generator["voxel_shape"],
    voxel_generator=voxel_generator,
    out_size_factor=8,
)

model = dict(
    type="VoxelNet",
    pretrained=None,
    reader=dict(type="DynamicVoxelEncoderV1", num_input_features=7),
    backbone=dict(type="PolarDenseFHD", num_input_features=7, ds_factor=8),
    neck=dict(
        type="RPN",
        layer_nums=[5, 5],
        ds_layer_strides=[1, 2],
        ds_num_filters=[128, 256],
        us_layer_strides=[1, 2],
        us_num_filters=[256, 256],
        num_input_features=256,
    ),
    bbox_head=bbox_head,
    seg_head=None,
)

assigner = dict(
    target_assigner=target_assigner,
    out_size_factor=8,
    gaussian_overlap=0.1,
    max_objs=500,
    min_radius=2,
    voxel_shape=voxel_generator["voxel_shape"],
)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    per_class_nms=False,
    nms=dict(nms_pre_max_size=1000, nms_post_max_size=83,
             nms_iou_threshold=0.2),
    rectify=rectify,
    score_threshold=0.1,
    pc_range=voxel_generator["range"],
    out_size_factor=8,
    voxel_size=voxel_generator["voxel_size"],
)

dataset_type = "NuScenesDataset"
data_root = "data/nuScenes"

train_preprocessor = dict(
    mode="train",
    shuffle_points=True,
    global_rot_noise=[-0.78539816, 0.78539816],
    global_scale_noise=[0.95, 1.05],
    db_sampler=None,
    class_names=class_names,
    voxel_shape=voxel_generator["voxel_shape"],
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
    dict(type="AssignLabel", cfg=train_cfg["assigner"], rectify=rectify),
    dict(type="Reformat"),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset=dataset_type),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignLabel", cfg=train_cfg["assigner"], rectify=rectify),
    dict(type="Reformat"),
]

train_anno = "data/nuScenes/infos_train_%02dsweeps_withvelo_filter_True.pkl" % nsweeps
val_anno = "data/nuScenes/infos_val_%02dsweeps_withvelo_filter_True.pkl" % nsweeps

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=8,
    train=dict(type=dataset_type, root_path=data_root, info_path=train_anno,
               nsweeps=nsweeps, class_names=class_names,
               pipeline=train_pipeline),
    val=dict(type=dataset_type, root_path=data_root, info_path=val_anno,
             nsweeps=nsweeps, class_names=class_names,
             pipeline=test_pipeline),
)

optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True,
                 moving_average=False)
lr_config = dict(type="one_cycle", lr_max=1e-3, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 20
device_ids = range(8)
dist_params = dict(backend="nccl")
log_level = "INFO"
work_dir = "./work_dirs/nusc_centerpoint_voxelnet_dcn"
workflow = [("train", 1)]

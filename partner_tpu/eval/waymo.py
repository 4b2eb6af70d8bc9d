"""Waymo evaluation output writer.

Serializes detections into the waymo-open-dataset ``objects.bin`` protobuf
layout consumed by the external devkit metrics tool, mirroring
/root/reference/det3d/datasets/waymo/waymo_common.py:52-115. The protobuf
classes are imported lazily; without the devkit installed a pickle fallback
is written instead (same content, ``detections.pkl``).
"""

import os
import pickle

import numpy as np

LABEL_TO_TYPE = {0: 1, 1: 2, 2: 4}  # Vehicle, Pedestrian, Cyclist


def create_pd_detection(detections, infos, result_path, tracking=False):
    os.makedirs(result_path or ".", exist_ok=True)
    try:
        from waymo_open_dataset import label_pb2
        from waymo_open_dataset.protos import metrics_pb2
    except ImportError:
        out = os.path.join(result_path or ".", "detections.pkl")
        with open(out, "wb") as f:
            pickle.dump(detections, f)
        return out

    infos_by_token = {i["token"]: i for i in infos}
    objects = metrics_pb2.Objects()
    for token, det in detections.items():
        info = infos_by_token[token]
        anno = info["anno"] if "anno" in info else {}
        box3d = np.asarray(det["box3d_lidar"])
        scores = np.asarray(det["scores"])
        labels = np.asarray(det["label_preds"])
        for i in range(box3d.shape[0]):
            o = metrics_pb2.Object()
            o.context_name = anno.get("scene_name", info.get("context", ""))
            o.frame_timestamp_micros = int(
                anno.get("frame_id", info.get("frame_id", 0))
            )
            b = o.object.box
            b.center_x, b.center_y, b.center_z = box3d[i, :3]
            b.length, b.width, b.height = (
                box3d[i, 3], box3d[i, 4], box3d[i, 5]
            )
            b.heading = box3d[i, -1]
            o.object.type = LABEL_TO_TYPE.get(int(labels[i]), 1)
            o.score = float(scores[i])
            objects.objects.append(o)
    out = os.path.join(result_path or ".", "detections.bin")
    with open(out, "wb") as f:
        f.write(objects.SerializeToString())
    return out

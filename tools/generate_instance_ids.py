"""Panoptic GT instance ids from boxes + per-point semantic labels.

Equivalent of /root/reference/tools/generate_instance_ids.py: every
labeled thing-class point inside a GT box gets that box's instance id
(1-based); all other points get 0. Reads an info pkl (entries with
points / gt_boxes / per-point labels), writes per-frame instance arrays.

Usage:
  python tools/generate_instance_ids.py --info_path infos.pkl \\
      --out instance_ids.pkl [--thing_classes 1 2 3]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from partner_tpu.core import box_np_ops


def instance_ids_for_frame(points_xyz, labels, gt_boxes, thing_classes):
    inst = np.zeros(len(points_xyz), np.int64)
    if not len(gt_boxes):
        return inst
    b7 = np.concatenate([gt_boxes[:, :6], gt_boxes[:, -1:]], axis=1)
    inside = box_np_ops.points_in_rbbox(points_xyz, b7)  # (P, M)
    thing = np.isin(labels, list(thing_classes))
    for m in range(inside.shape[1]):
        sel = inside[:, m] & thing & (inst == 0)
        inst[sel] = m + 1
    return inst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--info_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--thing_classes", nargs="*", type=int,
                   default=list(range(1, 11)))
    args = p.parse_args()

    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)
    out = {}
    for info in infos:
        pts = np.asarray(info["points"])
        labels = np.asarray(info.get("points_label",
                                     np.zeros(len(pts), np.int64)))
        boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))))
        out[info.get("token", "")] = instance_ids_for_frame(
            pts[:, :3], labels, boxes, args.thing_classes)
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote instance ids for {len(out)} frames -> {args.out}")


if __name__ == "__main__":
    main()

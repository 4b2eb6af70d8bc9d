"""Data preparation CLI: dataset infos + GT-AUG database.

Equivalent of /root/reference/tools/create_data.py:11-31 +
det3d/datasets/waymo/waymo_common.py:191-320 (info builder) +
det3d/datasets/utils/create_gt_database.py (database builder).

Expected raw layouts:
  waymo:  <root>/<split>/lidar/*.pkl   (frame objects with
          lidars.points_xyz / lidars.points_feature — the output of the
          TFRecord converter, waymo_converter.py:25-71)
          <root>/<split>/annos/*.pkl   (objects with box (9,), name,
          num_points, difficulty)
  nusc:   requires the nuscenes devkit for raw extraction; alternatively a
          pre-extracted frames pkl (list of dicts with token, lidar_path,
          gt_boxes, gt_names) is rewritten into the info format.

Usage:
  python tools/create_data.py waymo_data_prep --root_path data/waymo --split train
  python tools/create_data.py create_groundtruth_database \\
      --dataset WaymoDataset --root_path data/waymo --info_path <infos.pkl>
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from partner_tpu.core import box_np_ops
from partner_tpu.data.pipeline import get_obj, read_file, read_single_waymo


def _object_name(o):
    """Class name of a decoded anno object: real converter output carries
    the waymo type int under 'label' ('name' is the tracking uuid,
    waymo_decoder extract_objects); hand-built fixtures may carry the
    class string directly under 'name'."""
    from partner_tpu.data.waymo_decoder import NAME_BY_TYPE

    name = o.get("name", "")
    if isinstance(name, str) and name in NAME_BY_TYPE.values():
        return name
    label = o.get("label")
    if isinstance(label, (int, np.integer)):
        return NAME_BY_TYPE.get(int(label), "UNKNOWN")
    return str(name)


def _read_tfrecord(path):
    """Raw records of a TFRecord file — pure-python framing reader
    (8-byte LE length + 4-byte masked crc + payload + 4-byte crc); no
    TensorFlow needed, CRCs are not verified."""
    import struct

    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (length,) = struct.unpack("<Q", head)
            f.read(4)  # length crc
            payload = f.read(length)
            f.read(4)  # payload crc
            yield payload


def waymo_convert(record_path, root_path, split="train"):
    """Waymo TFRecords (or a pickled fake-frame list) -> per-frame
    lidar/anno pkls in the layout `waymo_data_prep` consumes.

    Equivalent of /root/reference/det3d/datasets/waymo/
    waymo_converter.py:25-71. Real `.tfrecord` inputs need the
    `waymo_open_dataset` proto package (imported lazily) for Frame
    parsing — the TFRecord container itself is read with a pure-python
    framing reader, so TensorFlow is never required. `.pkl` inputs
    (a pickled list of duck-typed frame objects) exercise the identical
    decode path for tests and TF-free environments.
    """
    import glob

    from partner_tpu.data import waymo_decoder

    lidar_dir = os.path.join(root_path, split, "lidar")
    anno_dir = os.path.join(root_path, split, "annos")
    os.makedirs(lidar_dir, exist_ok=True)
    os.makedirs(anno_dir, exist_ok=True)

    fnames = sorted(glob.glob(record_path))
    if not fnames:
        raise FileNotFoundError(f"no records match {record_path!r}")
    n_frames = 0
    for seq_id, fname in enumerate(fnames):
        if fname.endswith(".pkl"):
            with open(fname, "rb") as f:
                frames = pickle.load(f)
        else:
            from waymo_open_dataset import dataset_pb2  # lazy; proto only

            frames = []
            for payload in _read_tfrecord(fname):
                fr = dataset_pb2.Frame()
                fr.ParseFromString(payload)
                frames.append(fr)
        for frame_id, frame in enumerate(frames):
            name = f"seq_{seq_id}_frame_{frame_id}.pkl"
            with open(os.path.join(lidar_dir, name), "wb") as f:
                pickle.dump(waymo_decoder.decode_frame(frame, frame_id), f)
            with open(os.path.join(anno_dir, name), "wb") as f:
                pickle.dump(waymo_decoder.decode_annos(frame, frame_id), f)
            n_frames += 1
    print(f"converted {n_frames} frames from {len(fnames)} records "
          f"-> {lidar_dir}")
    return lidar_dir


def waymo_data_prep(root_path, split="train", nsweeps=1, max_sweeps=0):
    """Build info pkl from converted waymo frame/anno pkls.

    Info entries carry: path, anno_path, token, timestamp, sweeps (up to
    max_sweeps previous frames of the same sequence), gt_boxes (N, 9),
    gt_names — everything LoadPointCloudFromFile/Annotations consume.
    """
    lidar_dir = os.path.join(root_path, split, "lidar")
    anno_dir = os.path.join(root_path, split, "annos")
    frames = sorted(os.listdir(lidar_dir))
    infos = []
    prev_by_seq = {}
    for fname in frames:
        path = os.path.join(lidar_dir, fname)
        anno_path = os.path.join(anno_dir, fname)
        token = os.path.splitext(fname)[0]
        seq = token.rsplit("_frame_", 1)[0] if "_frame_" in token else token

        info = {"path": path, "anno_path": anno_path, "token": token,
                "timestamp": len(infos), "sweeps": []}
        if os.path.exists(anno_path):
            anno = get_obj(anno_path)
            objs = anno.get("objects", [])
            boxes = (np.stack([np.asarray(o["box"], np.float32)
                               for o in objs])
                     if objs else np.zeros((0, 9), np.float32))
            info["gt_boxes"] = boxes
            info["gt_names"] = np.asarray([_object_name(o) for o in objs])
            info["difficulty"] = np.asarray(
                [o.get("difficulty",
                       o.get("detection_difficulty_level", 0))
                 for o in objs], np.int32)
            info["num_points_in_gt"] = np.asarray(
                [o.get("num_points", -1) for o in objs], np.int32)

        hist = prev_by_seq.setdefault(seq, [])
        for prev in hist[-max_sweeps:][::-1]:
            info["sweeps"].append({"path": prev["path"],
                                   "token": prev["token"],
                                   "transform_matrix": None,
                                   "time_lag": info["timestamp"]
                                   - prev["timestamp"]})
        hist.append(info)

        if split == "train" and "gt_boxes" in info and not len(info["gt_boxes"]):
            continue  # filter_zero_gt
        infos.append(info)

    out = os.path.join(
        root_path,
        f"infos_{split}_{nsweeps:02d}sweeps_filter_zero_gt.pkl")
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} infos -> {out}")
    return out


def nuscenes_data_prep(root_path, version="v1.0-trainval", nsweeps=10,
                       frames_pkl=None):
    """Build nusc infos. With the devkit installed, extracts from the raw
    dataset; otherwise rewrites a pre-extracted frames pkl."""
    if frames_pkl is None:
        frames_pkl = os.path.join(root_path, "frames.pkl")
    try:
        from nuscenes import NuScenes  # noqa: F401
        have_devkit = True
    except ImportError:
        have_devkit = False

    if not have_devkit:
        if not os.path.exists(frames_pkl):
            raise FileNotFoundError(
                "nuscenes devkit unavailable and no pre-extracted frames "
                f"pkl at {frames_pkl}")
        with open(frames_pkl, "rb") as f:
            frames = pickle.load(f)
        infos = []
        for fr in frames:
            info = {
                "token": fr["token"],
                "lidar_path": fr["lidar_path"],
                "sweeps": fr.get("sweeps", []),
                "gt_boxes": np.asarray(fr.get("gt_boxes",
                                              np.zeros((0, 9)))),
                "gt_names": np.asarray(fr.get("gt_names", [])),
                "timestamp": fr.get("timestamp", 0),
            }
            # calibration pass-through: the nusc results writer needs
            # these to reach the devkit's global frame
            # (eval/nuscenes.py:_box_to_global)
            for k in ("lidar2ego_rotation", "lidar2ego_translation",
                      "ego2global_rotation", "ego2global_translation"):
                if k in fr:
                    info[k] = fr[k]
            infos.append(info)
    else:  # pragma: no cover - devkit not in this image
        raise NotImplementedError(
            "devkit extraction not wired in this environment")

    split = "train" if "train" in version else "val"
    out = os.path.join(
        root_path,
        f"infos_{split}_{nsweeps:02d}sweeps_withvelo_filter_True.pkl")
    with open(out, "wb") as f:
        pickle.dump(infos, f)
    print(f"wrote {len(infos)} infos -> {out}")
    return out


def _load_points(info, dataset):
    if dataset == "WaymoDataset":
        return read_single_waymo(get_obj(info["path"]))
    return read_file(str(info["lidar_path"]))


def create_groundtruth_database(dataset, root_path, info_path,
                                used_classes=None, db_path=None,
                                dbinfo_path=None):
    """Crop GT-box points into a sample database for GT-AUG.

    Output: <root>/gt_database/<class>_<i>.bin (float32, object-frame
    points: xyz shifted to the box center) + dbinfos pkl
    {class: [{name, path, box3d_lidar, num_points_in_gt, difficulty}]}.
    """
    db_path = db_path or os.path.join(root_path, "gt_database")
    dbinfo_path = dbinfo_path or os.path.join(root_path, "dbinfos_train.pkl")
    os.makedirs(db_path, exist_ok=True)

    with open(info_path, "rb") as f:
        infos = pickle.load(f)

    db_infos = {}
    count = 0
    for info in infos:
        boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 7))),
                           np.float32)
        names = np.asarray(info.get("gt_names", []))
        if not len(boxes):
            continue
        points = _load_points(info, dataset).astype(np.float32)
        # box columns: [x, y, z, dx, dy, dz, (vx, vy,) yaw]
        b7 = np.concatenate([boxes[:, :6], boxes[:, -1:]], axis=1)
        inside = box_np_ops.points_in_rbbox(points[:, :3], b7)
        for i, name in enumerate(names):
            if used_classes and name not in used_classes:
                continue
            obj_pts = points[inside[:, i]].copy()
            obj_pts[:, :3] -= b7[i, :3]
            rel = os.path.join("gt_database", f"{name}_{count}.bin")
            obj_pts.tofile(os.path.join(root_path, rel))
            db_infos.setdefault(str(name), []).append({
                "name": str(name),
                "path": rel,
                # full-dim box (velocity kept) so sampled boxes concatenate
                # with dataset GT
                "box3d_lidar": boxes[i],
                "num_points_in_gt": int(inside[:, i].sum()),
                "difficulty": int(info.get("difficulty", [0] * len(names))[i])
                if len(info.get("difficulty", [])) > i else 0,
            })
            count += 1

    with open(dbinfo_path, "wb") as f:
        pickle.dump(db_infos, f)
    n = sum(len(v) for v in db_infos.values())
    print(f"wrote {n} objects ({list(db_infos)}) -> {dbinfo_path}")
    return dbinfo_path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("waymo_convert")
    c.add_argument("--record_path", required=True,
                   help="glob of TFRecord files (or fake-frame pkls)")
    c.add_argument("--root_path", required=True)
    c.add_argument("--split", default="train")

    w = sub.add_parser("waymo_data_prep")
    w.add_argument("--root_path", required=True)
    w.add_argument("--split", default="train")
    w.add_argument("--nsweeps", type=int, default=1)
    w.add_argument("--max_sweeps", type=int, default=0)

    n = sub.add_parser("nuscenes_data_prep")
    n.add_argument("--root_path", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    n.add_argument("--nsweeps", type=int, default=10)
    n.add_argument("--frames_pkl", default=None)

    g = sub.add_parser("create_groundtruth_database")
    g.add_argument("--dataset", default="WaymoDataset")
    g.add_argument("--root_path", required=True)
    g.add_argument("--info_path", required=True)
    g.add_argument("--used_classes", nargs="*", default=None)

    args = p.parse_args()
    if args.cmd == "waymo_convert":
        waymo_convert(args.record_path, args.root_path, args.split)
    elif args.cmd == "waymo_data_prep":
        waymo_data_prep(args.root_path, args.split, args.nsweeps,
                        args.max_sweeps)
    elif args.cmd == "nuscenes_data_prep":
        nuscenes_data_prep(args.root_path, args.version, args.nsweeps,
                           args.frames_pkl)
    else:
        create_groundtruth_database(args.dataset, args.root_path,
                                    args.info_path, args.used_classes)


if __name__ == "__main__":
    main()

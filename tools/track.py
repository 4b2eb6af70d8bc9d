"""Tracking CLI — reproduces the reference's waymo/nusc tracking drivers.

Loads a prediction.pkl (token -> detections, the dist_test output), looks
up per-frame ego poses from the info pkl, converts detections to the
global frame, runs the greedy velocity tracker per sequence ordered by
timestamp, and writes tracking results (pkl always; waymo devkit bin when
the devkit is installed). Mirrors
/root/reference/tools/waymo_tracking/test.py:73-255 and
nusc_tracking/pub_test.py.

Usage:
  python tools/track.py --prediction eval_out/prediction.pkl \\
      --info_path data/waymo/infos_val_01sweeps_filter_zero_gt.pkl \\
      --work_dir tracking_out [--dataset waymo|nusc]
"""

import argparse
import os
import pickle
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from partner_tpu.eval.tracking import (
    WAYMO_TRACKING_NAMES,
    convert_detection_to_global_box,
    nusc_tracker,
    waymo_tracker,
)


def run_tracking(detections, infos, dataset="waymo", vehicle_only=False,
                 max_dist=None, score_thresh=None, max_age=3):
    """Returns {token: {tracking_ids, boxes_global, scores, labels}}.

    max_dist / score_thresh / max_age override the per-dataset tracker
    gates — the knobs the reference's threshold grid search sweeps
    (/root/reference/tools/waymo_tracking/line_search.py, test.py
    --vehicle/--pedestrian/--cyclist/--score_thresh)."""
    names = WAYMO_TRACKING_NAMES if dataset == "waymo" else None
    frames = convert_detection_to_global_box(detections, infos)

    # group frames by sequence (token prefix up to _frame_, else one seq)
    seqs = defaultdict(list)
    for fr in frames:
        tok = fr["token"]
        seq = tok.rsplit("_frame_", 1)[0] if "_frame_" in tok else "seq0"
        seqs[seq].append(fr)

    out = {}
    for seq, frs in seqs.items():
        kw = {}
        if score_thresh is not None:
            kw["score_thresh"] = score_thresh
        if dataset == "waymo":
            tracker = waymo_tracker(max_age=max_age, max_dist=max_dist, **kw)
        else:
            tracker = nusc_tracker(max_age=max_age, max_dist=max_dist, **kw)
        last_t = None
        for fr in sorted(frs, key=lambda f: f["timestamp"]):
            time_lag = (0.0 if last_t is None
                        else float(fr["timestamp"] - last_t))
            last_t = fr["timestamp"]
            dets = []
            for i in range(len(fr["scores"])):
                label = int(fr["label_preds"][i])
                if dataset == "waymo":
                    if label >= len(WAYMO_TRACKING_NAMES):
                        continue
                    name = WAYMO_TRACKING_NAMES[label]
                else:
                    name = str(label)
                dets.append({
                    "translation": fr["global_boxes"][i],
                    "velocity": fr["velocity"][i],
                    "detection_name": name,
                    "score": float(fr["scores"][i]),
                })
            tracks = tracker.step(dets, time_lag)
            out[fr["token"]] = {
                "tracking_ids": np.asarray(
                    [t["tracking_id"] for t in tracks], np.int64),
                "boxes_global": np.asarray(
                    [t["translation"] for t in tracks], np.float32).reshape(
                        -1, 3),
                "scores": np.asarray([t["score"] for t in tracks],
                                     np.float32),
                "labels": np.asarray([t["label_preds"] for t in tracks],
                                     np.int64),
            }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prediction", required=True)
    p.add_argument("--info_path", required=True)
    p.add_argument("--work_dir", default="./tracking_out")
    p.add_argument("--dataset", default="waymo", choices=["waymo", "nusc"])
    # per-class association gates + score threshold (reference
    # waymo_tracking/test.py:--vehicle/--pedestrian/--cyclist/--score_thresh)
    p.add_argument("--vehicle", type=float, default=None)
    p.add_argument("--pedestrian", type=float, default=None)
    p.add_argument("--cyclist", type=float, default=None)
    p.add_argument("--score_thresh", type=float, default=None)
    p.add_argument("--max_age", type=int, default=3)
    args = p.parse_args()

    with open(args.prediction, "rb") as f:
        detections = pickle.load(f)
    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)

    max_dist = None
    if any(v is not None for v in (args.vehicle, args.pedestrian,
                                   args.cyclist)):
        max_dist = {
            "VEHICLE": args.vehicle if args.vehicle is not None else 2.5,
            "PEDESTRIAN": (args.pedestrian if args.pedestrian is not None
                           else 1.0),
            "CYCLIST": args.cyclist if args.cyclist is not None else 1.5}
    results = run_tracking(detections, infos, args.dataset,
                           max_dist=max_dist, score_thresh=args.score_thresh,
                           max_age=args.max_age)

    os.makedirs(args.work_dir, exist_ok=True)
    out_pkl = os.path.join(args.work_dir, "tracking_result.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump(results, f)
    n = sum(len(r["tracking_ids"]) for r in results.values())
    print(f"wrote {n} tracked boxes over {len(results)} frames -> {out_pkl}")

    if args.dataset == "waymo":
        # devkit bin via the existing writer (pickle fallback without it)
        from partner_tpu.eval.waymo import create_pd_detection

        dets = {
            tok: {"box3d_lidar": np.concatenate(
                      [r["boxes_global"],
                       np.tile([[4.0, 2.0, 1.6, 0.0]],
                               (len(r["boxes_global"]), 1))], axis=1),
                  "scores": r["scores"],
                  "label_preds": r["labels"]}
            for tok, r in results.items()
        }
        create_pd_detection(dets, infos, args.work_dir, tracking=True)


if __name__ == "__main__":
    main()

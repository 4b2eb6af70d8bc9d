"""Tracking-gate grid search — the reference's line_search driver, in-process.

/root/reference/tools/waymo_tracking/line_search.py shells out one
tracking run per (score_thresh, max_dist) combo and eyeballs the devkit
stats; here the sweep runs in-process against the local CLEAR-MOT
evaluator (eval/tracking.mota_evaluate) and prints the best gate per
class-set by MOTA.

Usage:
  python tools/track_line_search.py --prediction eval_out/prediction.pkl \\
      --info_path infos_val.pkl --gt_path gt_tracks.pkl \\
      [--scores 0.4:0.8:0.05] [--dists 0.5:3.0:0.5]

gt_path: pickle {token: {centers (M,3) global, labels (M,), ids (M,)}}.
"""

import argparse
import itertools
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def _parse_range(spec):
    lo, hi, step = (float(x) for x in spec.split(":"))
    return np.arange(lo, hi + 1e-9, step)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prediction", required=True)
    p.add_argument("--info_path", required=True)
    p.add_argument("--gt_path", required=True)
    p.add_argument("--dataset", default="waymo", choices=["waymo", "nusc"])
    p.add_argument("--scores", default="0.4:0.8:0.05",
                   help="score_thresh sweep lo:hi:step")
    p.add_argument("--dists", default="0.5:3.0:0.5",
                   help="max_dist sweep lo:hi:step (applied per class)")
    p.add_argument("--match_dist", type=float, default=2.0,
                   help="MOTA association gate (m)")
    args = p.parse_args()

    from track import run_tracking

    from partner_tpu.eval.tracking import mota_evaluate

    with open(args.prediction, "rb") as f:
        detections = pickle.load(f)
    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)
    with open(args.gt_path, "rb") as f:
        gt_frames = pickle.load(f)

    best = None
    for score, dist in itertools.product(_parse_range(args.scores),
                                         _parse_range(args.dists)):
        max_dist = {"VEHICLE": dist, "PEDESTRIAN": dist * 0.4,
                    "CYCLIST": dist * 0.6}
        results = run_tracking(detections, infos, args.dataset,
                               max_dist=max_dist, score_thresh=float(score))
        m = mota_evaluate(results, gt_frames,
                          max_match_dist=args.match_dist)
        print(f"score={score:.2f} dist={dist:.2f} -> MOTA {m['mota']:.4f} "
              f"(miss {m['misses']} fp {m['false_positives']} "
              f"idsw {m['id_switches']})")
        if best is None or m["mota"] > best[0]:
            best = (m["mota"], float(score), float(dist), m)
    print(f"\nbest: MOTA {best[0]:.4f} @ score_thresh={best[1]:.2f} "
          f"max_dist={best[2]:.2f}")


if __name__ == "__main__":
    main()

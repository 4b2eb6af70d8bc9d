"""Multi-model prediction ensembling with rotated NMS.

Equivalent of /root/reference/tools/nms_better.py: merges several
prediction.pkl files (optionally score-weighted) and re-runs class-aware
rotated NMS per frame on the union.

Usage:
  python tools/nms_ensemble.py out.pkl pred_a.pkl pred_b.pkl \\
      [--weights 1.0 0.8] [--iou 0.7] [--post 500]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def ensemble(preds_list, weights=None, iou=0.7, post=500):
    import jax.numpy as jnp

    from partner_tpu.ops.nms import batched_rotated_nms

    weights = weights or [1.0] * len(preds_list)
    tokens = set()
    for p in preds_list:
        tokens |= set(p)
    out = {}
    for tok in tokens:
        boxes, scores, labels = [], [], []
        for w, p in zip(weights, preds_list):
            if tok not in p:
                continue
            d = p[tok]
            boxes.append(np.asarray(d["box3d_lidar"]))
            scores.append(np.asarray(d["scores"]) * w)
            labels.append(np.asarray(d["label_preds"]))
        b = np.concatenate(boxes) if boxes else np.zeros((0, 7))
        s = np.concatenate(scores) if scores else np.zeros((0,))
        l = np.concatenate(labels) if labels else np.zeros((0,), np.int64)
        if not len(b):
            out[tok] = {"box3d_lidar": b, "scores": s, "label_preds": l}
            continue
        bev = np.stack([b[:, 0], b[:, 1], b[:, 3], b[:, 4], b[:, -1]], -1)
        keep, kmask = batched_rotated_nms(
            jnp.asarray(bev), jnp.asarray(s.astype(np.float32)),
            jnp.asarray(l.astype(np.int32)), iou, min(post, len(b)))
        keep = np.asarray(keep)[np.asarray(kmask)]
        out[tok] = {"box3d_lidar": b[keep], "scores": s[keep],
                    "label_preds": l[keep]}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("inputs", nargs="+")
    p.add_argument("--weights", nargs="*", type=float, default=None)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--post", type=int, default=500)
    args = p.parse_args()

    preds = []
    for path in args.inputs:
        with open(path, "rb") as f:
            preds.append(pickle.load(f))
    merged = ensemble(preds, args.weights, args.iou, args.post)
    with open(args.output, "wb") as f:
        pickle.dump(merged, f)
    n = sum(len(v["scores"]) for v in merged.values())
    print(f"wrote {n} boxes over {len(merged)} frames -> {args.output}")


if __name__ == "__main__":
    main()

"""Evaluation CLI — the det3d tools/dist_test.py equivalent.

Usage: python tools/dist_test.py CONFIG --checkpoint CKPT [--work_dir D]
       [--speed_test] [--max_frames N] [--input auto|points|voxels]

Thin CLI over partner_tpu.eval.evaluator (shared with the trainer's
mid-training validation): jitted predict over the val set with routing by
the detector's declared input contract, middle-third wall-clock FPS
(reference protocol, tools/dist_test.py:155-168,203), multi-host gather,
det + seg + panoptic evaluation (reference tools/dist_test.py:161-234).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--work_dir", default="./eval_out")
    p.add_argument("--speed_test", action="store_true")
    p.add_argument("--testset", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--max_points", type=int, default=200000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--input", choices=["auto", "points", "voxels"],
                   default="auto",
                   help="example contract fed to the detector; auto uses "
                        "the detector's declared input_kind")
    p.add_argument("--mesh", default="data=1",
                   help="device mesh spec 'data=N[,model=M][,azimuth=K]' "
                        "for mesh-sharded eval (batch over 'data', params "
                        "TP over 'model', azimuth-sector SP); the default "
                        "keeps the single-device per-frame latency protocol")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from partner_tpu.data import build_dataset
    from partner_tpu.eval.evaluator import evaluate, init_example
    from partner_tpu.models import build_detector
    from partner_tpu.train.checkpoint import load_checkpoint
    from partner_tpu.train.config import Config
    from partner_tpu.train.hooks import get_logger
    from partner_tpu.parallel import dist

    dist.initialize()

    cfg = Config.fromfile(args.config)
    os.makedirs(args.work_dir, exist_ok=True)
    logger = get_logger(args.work_dir)

    from partner_tpu.parallel.mesh import make_mesh, parse_mesh_spec

    n_data, n_model, n_az = parse_mesh_spec(args.mesh, len(jax.devices()))
    mesh = None
    det_kwargs = {}
    if n_data * n_model * n_az > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(n_data, n_model, n_az)
        logger.info(f"mesh: data={n_data} model={n_model} azimuth={n_az}")
        if n_az > 1:
            det_kwargs["bev_pspec"] = NamedSharding(
                mesh, P(None, "azimuth", None, None))

    det = build_detector(cfg.model, cfg.get("train_cfg"), cfg.get("test_cfg"),
                         voxel_generator=cfg.get("voxel_generator"),
                         **det_kwargs)
    dataset = build_dataset(dict(cfg.data["val"]))
    kind = args.input if args.input != "auto" else getattr(
        det, "input_kind", "voxels")
    logger.info(f"model type {cfg.model['type']}, input contract: {kind}")

    variables = det.init(jax.random.PRNGKey(0), init_example(dataset, kind))
    if args.checkpoint:
        payload, _ = load_checkpoint(args.checkpoint)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda t, v: jnp.asarray(v), variables["params"],
                payload["params"],
            ),
            "batch_stats": jax.tree_util.tree_map(
                lambda t, v: jnp.asarray(v),
                variables.get("batch_stats", {}), payload["batch_stats"],
            ),
        }
        logger.info(f"loaded {args.checkpoint}")

    # --speed_test forces batch 1 like the reference
    # (tools/dist_test.py:118: samples_per_gpu unless speed_test)
    batch_size = 1 if args.speed_test else args.batch_size
    result, _fps = evaluate(
        det, cfg, dataset, variables, args.work_dir, logger,
        batch_size=batch_size, max_points=args.max_points,
        max_frames=args.max_frames, input_kind=kind, testset=args.testset,
        mesh=mesh,
    )
    return result


if __name__ == "__main__":
    main()

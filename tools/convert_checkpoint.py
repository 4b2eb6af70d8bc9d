"""Checkpoint surgery: torch reference state_dict -> partner_tpu checkpoint.

Equivalent of /root/reference/tools/convert_voxelnet.py: loads a torch
.pth (CPU), maps the RPN / CenterHead / SpMiddleResNetFHD weights through
partner_tpu.train.torch_convert, and writes a framework checkpoint that
tools/train.py --load_from / dist_test.py --checkpoint consume.

Usage:
  python tools/convert_checkpoint.py in.pth out_dir \\
      [--layer_nums 5 5] [--us_strides 1 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("out_dir")
    p.add_argument("--layer_nums", nargs="*", type=int, default=[5, 5])
    p.add_argument("--us_strides", nargs="*", type=int, default=[1, 2])
    args = p.parse_args()

    import torch

    from partner_tpu.train import torch_convert as tc
    from partner_tpu.train.checkpoint import save_checkpoint
    from partner_tpu.train.train_state import TrainState

    import jax.numpy as jnp

    payload = torch.load(args.input, map_location="cpu")
    sd = payload.get("state_dict", payload)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    params, stats = {}, {}
    neck_sd = {k.removeprefix("neck."): v for k, v in sd.items()
               if k.startswith("neck.")}
    if neck_sd:
        p_, s_ = tc.convert_rpn_state_dict(neck_sd, args.layer_nums,
                                           args.us_strides)
        params["neck"], stats["neck"] = p_, s_
    bb_sd = {k.removeprefix("backbone."): v for k, v in sd.items()
             if k.startswith("backbone.")}
    if bb_sd:
        try:
            p_, s_ = tc.convert_backbone_state_dict(bb_sd)
            params["backbone"], stats["backbone"] = p_, s_
        except KeyError as e:
            print(f"backbone conversion skipped (missing key {e})")

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=())
    save_checkpoint(args.out_dir, state,
                    meta={"converted_from": args.input})
    print(f"converted {len(sd)} torch tensors -> {args.out_dir} "
          f"(sections: {sorted(params)})")


if __name__ == "__main__":
    main()

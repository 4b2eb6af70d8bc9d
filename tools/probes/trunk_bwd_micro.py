"""Why does the trunk backward cost 25 ms (5.3x its 4.7 ms inference
forward)? Standalone grad programs of the flagship trunk2d replica at
exact flagship shapes, splitting conv dgrad/wgrad from BatchNorm train
costs (follow-up to tools/probes/train_bwd_anatomy.py).

Variants:
  fwd_infer    inference forward (running BN stats) — the 4.7 ms anchor
  fwd_train    train forward (batch BN stats computed)
  grad         full train grad (the 25 ms under test)
  grad_bnbf16  BN normalize pass in bf16 (stats still f32)
  grad_nobn    convs + bias only — the conv dgrad/wgrad floor
  grad_nores   no residual adds (isolate the f32 residual chains)

Writes one JSON line.
"""
import json
import sys
import time
from typing import Any

import numpy as np

sys.path.insert(0, "/root/repo")
import flax.linen as nn
import jax
import jax.numpy as jnp


class Trunk(nn.Module):
    """Flagship trunk2d replica: conv_a2d(320->160 @512x288) + 1 res block,
    conv_b2d(stride2 ->256 @256x144) + 2 res blocks (backbone_dense.py)."""

    norm: str = "bn"          # bn | bn_bf16 | none
    residual: bool = True
    dtype: Any = jnp.bfloat16

    def _norm(self, x):
        if self.norm == "none":
            return x.astype(jnp.float32)
        dt = jnp.bfloat16 if self.norm == "bn_bf16" else jnp.float32
        return nn.BatchNorm(use_running_average=False, momentum=0.99,
                            epsilon=1e-3, dtype=dt)(x).astype(jnp.float32)

    def _block(self, x, feats, stride=1):
        x = nn.Conv(feats, (3, 3), strides=(stride,) * 2, padding="SAME",
                    use_bias=self.norm == "none", dtype=self.dtype)(x)
        return nn.relu(self._norm(x)).astype(self.dtype)

    def _res(self, x, feats):
        idn = x
        y = nn.Conv(feats, (3, 3), use_bias=self.norm == "none",
                    dtype=self.dtype)(x)
        y = nn.relu(self._norm(y)).astype(self.dtype)
        y = nn.Conv(feats, (3, 3), use_bias=self.norm == "none",
                    dtype=self.dtype)(y)
        y = self._norm(y)
        if self.residual:
            y = y + idn.astype(jnp.float32)
        return nn.relu(y).astype(self.dtype)

    @nn.compact
    def __call__(self, x):
        x = self._block(x, 160)
        x = self._res(x, 160)
        x = self._block(x, 256, stride=2)
        x = self._res(x, 256)
        x = self._res(x, 256)
        return x


rng = np.random.RandomState(0)
canvas = jnp.asarray(rng.rand(1, 512, 288, 320).astype(np.float32)) \
    .astype(jnp.bfloat16)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def window(fn, n=20, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        for _ in range(3):
            out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


res = {}
base = Trunk()
variables = base.init(jax.random.PRNGKey(0), canvas)
params, bs = variables["params"], variables["batch_stats"]


def make_progs(m, label, p):
    v = {"params": p}
    if m.norm != "none":
        v["batch_stats"] = bs

    def fwd(pp):
        vv = dict(v); vv["params"] = pp
        out, _ = m.apply(vv, canvas, mutable=["batch_stats"]
                         if m.norm != "none" else [])
        return (out.astype(jnp.float32) ** 2).sum()

    jf = jax.jit(fwd)
    jg = jax.jit(jax.grad(fwd))
    print(f"compiling {label}...", flush=True)
    float(jf(p)); sync(jg(p))
    res[f"fwd_{label}"] = round(window(lambda: jf(p)), 2)
    res[f"grad_{label}"] = round(window(lambda: jg(p)), 2)
    print(f"{label}: fwd {res[f'fwd_{label}']} ms, "
          f"grad {res[f'grad_{label}']} ms", flush=True)


make_progs(base, "bn", params)
make_progs(Trunk(norm="bn_bf16"), "bn_bf16", params)
vn = Trunk(norm="none").init(jax.random.PRNGKey(0), canvas)
make_progs(Trunk(norm="none"), "nobn", vn["params"])
vnr = Trunk(norm="none", residual=False).init(jax.random.PRNGKey(0), canvas)
make_progs(Trunk(norm="none", residual=False), "nobn_nores", vnr["params"])

print(json.dumps(res), flush=True)

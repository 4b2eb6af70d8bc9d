"""In-process on-chip anatomy of the E2E head (the 5.0 ms / ~52 TF/s
phase of the flagship frame — PERF.md frame table — and the only compute
phase well below the conv roofline).

Times cumulative prefixes of E2ESWVoteHead at flagship shapes
((1, 256, 144, 512) BEV map, ws=8, depth 2, bf16 compute), each prefix
jitted whole so XLA cross-stage fusion is preserved (the frame-anatomy
methodology):

  P1  vote_head + vote_cls_head convs
  P2  P1 + SwinVoteTransformer (patch embed + 2 blocks + norms)
  P3  full __call__ (P2 + cls/bbox/iou head convs)

plus depth-ablated heads (sl_depth 0/1) to split the Swin phase into
patch-embed/norm overhead vs per-block cost, and a raw-conv program (the
same 8 convs as lax calls, nothing else) as the conv-roofline floor.

Writes one JSON line with marginal ms per stage.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from partner_tpu.models.e2e_head import E2ESWVoteHead

B, H, W, C = 1, 256, 144, 512
NCLS = 1


def make_head(depth):
    return E2ESWVoteHead(
        in_channels=C, num_classes=NCLS, kernel_size=3, window_size=8,
        sl_depth=depth, num_heads=4, iou_head=True,
        encode_angle_by_sincos=True, grid_size=(1152, 2048, 40),
        pc_range=(0.3, -3.14368, -2.0, 75.18, 3.14368, 4.0),
        out_size_factor=8, voxel_shape="cylinder",
        compute_dtype="bfloat16",
    )


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.1)

head2 = make_head(2)
v2 = head2.init(jax.random.PRNGKey(0), x, train=False)
head1 = make_head(1)
v1 = head1.init(jax.random.PRNGKey(1), x, train=False)
head0 = make_head(0)
v0 = head0.init(jax.random.PRNGKey(2), x, train=False)


@jax.jit
def p0(v, x):
    return jnp.sum(x)


@jax.jit
def p1(v, x):
    def f(m, x):
        votes = m.vote_head(x)
        vote_cls = m.vote_cls_head(x, False)
        return votes, vote_cls
    return head2.apply(v, x, method=f)


@jax.jit
def p2(v, x):
    def f(m, x):
        votes = m.vote_head(x)
        vote_cls = m.vote_cls_head(x, False)
        voted = jnp.concatenate([votes, vote_cls], axis=-1)
        pos = jnp.broadcast_to(m.offset_grid[None], x.shape[:3] + (2,))
        return m.layer(x, pos, voted, deterministic=True)
    return head2.apply(v, x, method=f)


@jax.jit
def p3(v, x):
    return head2.apply(v, x, train=False)


@jax.jit
def p3_d1(v, x):
    return head1.apply(v, x, train=False)


@jax.jit
def p3_d0(v, x):
    return head0.apply(v, x, train=False)


# conv-roofline floor: the head's 8 convs as bare lax calls (bf16, same
# channel plan), no norms/attention/relu chaining beyond what fuses free
def _conv(x, cin, cout, k, key):
    w = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) * 0.02
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def convs_only(x):
    xb = x.astype(jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(3), 10)
    a = _conv(xb, C, 64, 3, ks[0])           # vote conv1
    a = _conv(jax.nn.relu(a), 64, 2, 3, ks[1])
    b = _conv(xb, C, 256, 3, ks[2])          # vote_cls conv1
    b = _conv(jax.nn.relu(b), 256, 1, 3, ks[3])
    e = _conv(xb, C, 256, 1, ks[4])          # patch embed
    f = _conv(e, 256, 256, 3, ks[5])         # cls conv1 (on 256ch feat)
    f2 = _conv(jax.nn.relu(f), 256, NCLS, 3, ks[6])
    g = _conv(e, 256, 64, 3, ks[7])          # bbox conv1
    g2 = _conv(jax.nn.relu(g), 64, 8, 3, ks[8])
    h = _conv(e, 256, 64, 3, ks[9])          # iou conv1
    h2 = _conv(jax.nn.relu(h), 64, 1, 3, ks[0])
    return (jnp.sum(a) + jnp.sum(b) + jnp.sum(f2) + jnp.sum(g2)
            + jnp.sum(h2))


def sync(out):
    # drain the queue by fetching ONE scalar: slice on device (tiny
    # program), then a 4-byte host transfer. block_until_ready alone does
    # not fence through the axon tunnel, and np.asarray on a full map
    # would add a 36 MB transfer to every window.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


progs = [
    ("p0_noop", lambda: p0(v2, x)),
    ("p1_vote_convs", lambda: p1(v2, x)),
    ("p2_plus_swin", lambda: p2(v2, x)),
    ("p3_full_head", lambda: p3(v2, x)),
    ("p3_depth1", lambda: p3_d1(v1, x)),
    ("p3_depth0", lambda: p3_d0(v0, x)),
    ("convs_only_floor", lambda: convs_only(x)),
]

print("compiling...", flush=True)
for name, fn in progs:
    sync(fn())

N = 40


def window(fn):
    for _ in range(4):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / N * 1e3


times = {name: [] for name, _ in progs}
for r in range(3):
    for name, fn in progs:
        times[name].append(window(fn))
    print(f"round {r}: " + " ".join(
        f"{n}={times[n][-1]:.2f}" for n, _ in progs), flush=True)

best = {n: min(v) for n, v in times.items()}
res = {
    "ms": {n: round(v, 3) for n, v in best.items()},
    "marginal_ms": {
        "vote_convs": round(best["p1_vote_convs"] - best["p0_noop"], 3),
        "swin_core": round(best["p2_plus_swin"] - best["p1_vote_convs"], 3),
        "final_heads": round(best["p3_full_head"] - best["p2_plus_swin"], 3),
        "per_block": round(best["p3_full_head"] - best["p3_depth1"], 3),
        "embed_norms": round(best["p3_depth0"] - best["p1_vote_convs"]
                             - (best["p3_full_head"] - best["p2_plus_swin"]),
                             3),
        "conv_floor_all8": round(best["convs_only_floor"]
                                 - best["p0_noop"], 3),
    },
}
print(json.dumps(res), flush=True)

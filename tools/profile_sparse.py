"""Microbenchmark the sparse-conv primitives on the real chip.

Times each building block of the SpMiddleResNetFHD path at flagship scale
(150k voxels, grid 1152x2048x40) so backbone design choices are driven by
measured numbers, not guesses. Usage:

    python tools/profile_sparse.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=5, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # host readback fence (axon remote backend)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from partner_tpu.models import sparse

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    grid = (41, 2049, 1153)  # z, az, r (flagship + extra_sp_shape pad)
    total = grid[0] * grid[1] * grid[2]

    rng = np.random.RandomState(0)
    cand = np.unique(rng.randint(0, total, size=int(n * 1.2)).astype(np.int64))
    while len(cand) < n:
        cand = np.unique(np.concatenate([cand, rng.randint(0, total, size=n)]))
    lin = np.sort(cand[:n])
    z = lin // (grid[1] * grid[2])
    rem = lin - z * grid[1] * grid[2]
    y = rem // grid[2]
    x = rem - y * grid[2]
    coords = jnp.asarray(np.stack([z, y, x], 1).astype(np.int32))
    mask = jnp.ones((n,), bool)

    print(f"n={n} grid={grid} total_cells={total/1e6:.1f}M", flush=True)

    # 1) neighbor maps
    f_bin = jax.jit(lambda c, m: sparse.build_subm_neighbor_map(c, m, grid))
    t = bench(f_bin, coords, mask)
    print(f"subm nmap binary-search : {t*1e3:9.2f} ms", flush=True)

    f_dense = jax.jit(
        lambda c, m: sparse.build_subm_neighbor_map_dense(c, m, grid))
    t = bench(f_dense, coords, mask)
    print(f"subm nmap dense-table   : {t*1e3:9.2f} ms", flush=True)

    nmap = f_dense(coords, mask)

    # 2) gather+matmul conv at various widths
    for c_in, c_out in [(16, 16), (32, 32), (64, 64), (128, 128)]:
        feats = jnp.asarray(rng.rand(n, c_in).astype(np.float32))
        w = jnp.asarray(rng.rand(27 * c_in, c_out).astype(np.float32))

        def conv(f, nm, w):
            g = sparse._gather_padded(f, nm)
            return g.reshape(n, -1) @ w

        t = bench(jax.jit(conv), feats, nmap, w)
        gb = n * 27 * c_in * 4 / 1e9
        print(f"gather+matmul C={c_in:3d}    : {t*1e3:9.2f} ms "
              f"({gb/t:6.1f} GB/s gather)", flush=True)

    # 3) downsample (strided output site enumeration)
    f_ds = jax.jit(lambda c, m: sparse.downsample_coords(
        c, m, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), n))
    t = bench(f_ds, coords, mask)
    print(f"downsample sort-unique  : {t*1e3:9.2f} ms", flush=True)

    f_dsd = jax.jit(lambda c, m: sparse.downsample_coords_dense(
        c, m, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), n))
    t = bench(f_dsd, coords, mask)
    print(f"downsample dense-occ    : {t*1e3:9.2f} ms", flush=True)

    # 4) raw sort of the 27N query list (what method='sort' pays)
    q = jnp.asarray(rng.randint(0, total, size=27 * n).astype(np.int32))
    t = bench(jax.jit(jnp.sort), q)
    print(f"jnp.sort 27N int32      : {t*1e3:9.2f} ms", flush=True)

    # 5) scatter into dense table
    f_tab = jax.jit(lambda c, m: sparse.build_index_table(c, m, grid))
    t = bench(f_tab, coords, mask)
    print(f"index-table build       : {t*1e3:9.2f} ms", flush=True)

    # 6) sparse_to_dense at stride-8 output (256x144 BEV, 128ch, nz=2)
    m8 = n // 8
    g8 = (2, 256, 144)
    t8 = g8[0] * g8[1] * g8[2]
    lin8 = np.sort(rng.choice(t8, size=min(m8, t8 - 1), replace=False))
    z8 = lin8 // (g8[1] * g8[2])
    r8 = lin8 - z8 * g8[1] * g8[2]
    c8 = jnp.asarray(
        np.stack([z8, r8 // g8[2], r8 % g8[2]], 1).astype(np.int32)[None])
    m8a = jnp.ones((1, len(lin8)), bool)
    f8 = jnp.asarray(rng.rand(1, len(lin8), 128).astype(np.float32))
    sg = sparse.SparseGrid(f8, c8, m8a, g8)
    t = bench(jax.jit(lambda g: sparse.sparse_to_dense(g)), sg)
    print(f"sparse_to_dense stride8 : {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

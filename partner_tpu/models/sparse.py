"""Capacity-bounded sparse 3D convolution for TPU — the spconv replacement.

The reference backbone (/root/reference/det3d/models/backbones/scn.py) is
built on spconv's SubMConv3d / SparseConv3d. TPUs want static shapes and
big gathers + matmuls, so this module implements sparse conv as:

  1. active voxels live in fixed-capacity padded buffers
     (features (B, N, C), coords (B, N, 3) z-major, mask (B, N)),
     kept *sorted by linear cell id* (the voxelizer emits this order and
     strided convs preserve it);
  2. a per-resolution neighbor map — index of each voxel's K=27 spatial
     neighbors found by binary search (jnp.searchsorted) over the sorted
     ids — built once and shared by every submanifold conv at that
     resolution (the analog of spconv's indice_key rulebook reuse,
     scn.py:27-35);
  3. conv itself = zero-padded neighbor gather -> (N, K*Cin) @ (K*Cin, Cout)
     matmul on the MXU.

Strided convs enumerate candidate output sites per input (<= 2 per spatial
dim for kernel 3 stride 2), deduplicate via sort + capacity-capped unique,
then gather their receptive fields from the input buffer. Output sites are
exactly spconv's (any output whose receptive field touches an active input),
so dense-conv oracle parity holds bit-for-bit up to float assoc.
"""

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MaskedBatchNorm


class SparseGrid(NamedTuple):
    """Fixed-capacity batched sparse tensor. coords are (z, y, x), sorted by
    linear id per sample; invalid rows have mask False."""

    features: jnp.ndarray  # (B, N, C)
    coords: jnp.ndarray    # (B, N, 3) int32
    mask: jnp.ndarray      # (B, N) bool
    shape: Tuple[int, int, int]  # (nz, ny, nx) static


def _lin_ids(coords, mask, shape):
    nz, ny, nx = shape
    big = jnp.int32(nz * ny * nx)
    lin = (coords[..., 0] * ny + coords[..., 1]) * nx + coords[..., 2]
    return jnp.where(mask, lin, big), big


def _subm_offsets(kernel=3):
    k = kernel // 2
    r = np.arange(-k, k + 1)
    off = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return jnp.asarray(off, dtype=jnp.int32)  # (27, 3) z-major


def build_subm_neighbor_map(coords, mask, shape, kernel=3):
    """(N, K) neighbor indices with sentinel N for missing; per sample.

    coords (N, 3) sorted by linear id; mask (N,).
    """
    n = coords.shape[0]
    lin, big = _lin_ids(coords, mask, shape)
    off = _subm_offsets(kernel)
    ncoords = coords[:, None, :] + off[None]  # (N, K, 3)
    bounds = jnp.array(shape, dtype=jnp.int32)
    inb = jnp.all((ncoords >= 0) & (ncoords < bounds), axis=-1) & mask[:, None]
    nlin = (ncoords[..., 0] * shape[1] + ncoords[..., 1]) * shape[2] + ncoords[..., 2]
    nlin = jnp.where(inb, nlin, big)
    # method='sort' (merge by co-sorting) is ~3.5x faster than the default
    # binary-search lowering on TPU for megascale query sets
    idx = jnp.searchsorted(lin, nlin.reshape(-1), method="sort").reshape(
        nlin.shape
    )
    found = (idx < n) & (jnp.take(lin, jnp.minimum(idx, n - 1)) == nlin) & inb
    return jnp.where(found, idx, n).astype(jnp.int32)


def _gather_padded(features, nmap):
    """features (N, C), nmap (N, K) with sentinel N -> (N, K, C)."""
    padded = jnp.concatenate([features, jnp.zeros_like(features[:1])], axis=0)
    return padded[nmap]


# ---------------------------------------------------------------------------
# dense-table indexing: one scatter builds a cell -> row lookup table, every
# neighbor query is then a single gather. ~17x fewer random accesses than
# binary search (log2(N) gather rounds), at the cost of a grid-sized int32
# buffer. Used per resolution and shared by all convs at that resolution.
# ---------------------------------------------------------------------------


def build_index_table(coords, mask, shape):
    """(total+1,) int32 table mapping linear cell id -> row index (sentinel
    n for empty cells; slot `total` absorbs invalid-row writes)."""
    n = coords.shape[0]
    total = int(shape[0]) * int(shape[1]) * int(shape[2])
    lin, _ = _lin_ids(coords, mask, shape)
    table = jnp.full((total + 1,), n, dtype=jnp.int32)
    return table.at[lin].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


def lookup_neighbors(table, shape, base_coords, base_mask, offsets, n_rows):
    """Gather row indices of base_coords+offsets from an index table.

    base_coords (M, 3); offsets (K, 3); returns (M, K) with sentinel n_rows.
    """
    big = jnp.int32(shape[0] * shape[1] * shape[2])
    ncoords = base_coords[:, None, :] + offsets[None]
    bounds = jnp.array(shape, dtype=jnp.int32)
    inb = jnp.all((ncoords >= 0) & (ncoords < bounds), axis=-1) & base_mask[:, None]
    nlin = (ncoords[..., 0] * shape[1] + ncoords[..., 1]) * shape[2] + ncoords[..., 2]
    nlin = jnp.where(inb, nlin, big)
    idx = table[nlin]
    return jnp.where(inb, idx, n_rows).astype(jnp.int32)


def build_subm_neighbor_map_dense(coords, mask, shape, kernel=3):
    table = build_index_table(coords, mask, shape)
    return lookup_neighbors(
        table, shape, coords, mask, _subm_offsets(kernel), coords.shape[0]
    )


def downsample_coords_dense(coords, mask, shape, kernel, stride, padding, cap):
    """Dense-occupancy variant of :func:`downsample_coords`: candidate sites
    are scattered into an output-resolution occupancy grid; ranks come from
    one cumsum, so no sort of the 8N candidate list is needed."""
    kernel = np.broadcast_to(np.asarray(kernel), (3,))
    stride = np.broadcast_to(np.asarray(stride), (3,))
    padding = np.broadcast_to(np.asarray(padding), (3,))
    out_shape = strided_out_shape(shape, kernel, stride, padding)
    nzo, nyo, nxo = out_shape
    total = nzo * nyo * nxo

    cand_per_dim, valid_per_dim = [], []
    for d in range(3):
        i = coords[:, d]
        j_lo = -((-(i + int(padding[d]) - int(kernel[d]) + 1)) // int(stride[d]))
        j_hi = (i + int(padding[d])) // int(stride[d])
        c0, c1 = j_lo, jnp.minimum(j_lo + 1, j_hi)
        cand = jnp.stack([c0, c1], axis=1)
        valid = (cand >= 0) & (cand < out_shape[d]) & (cand <= j_hi[:, None])
        valid = valid & jnp.stack([jnp.ones_like(c0, bool), c1 > c0], axis=1)
        cand_per_dim.append(cand)
        valid_per_dim.append(valid)

    cz = cand_per_dim[0][:, :, None, None]
    cy = cand_per_dim[1][:, None, :, None]
    cx = cand_per_dim[2][:, None, None, :]
    valid = (
        valid_per_dim[0][:, :, None, None]
        & valid_per_dim[1][:, None, :, None]
        & valid_per_dim[2][:, None, None, :]
        & mask[:, None, None, None]
    )
    lin = ((cz * nyo + cy) * nxo + cx).reshape(-1)
    lin = jnp.where(valid.reshape(-1), lin, total)

    occ = jnp.zeros((total + 1,), jnp.int32).at[lin].set(1)[:total]
    cum = jnp.cumsum(occ)  # inclusive rank
    rank = cum[jnp.minimum(lin, total - 1)] - 1  # per candidate
    slot = jnp.where((lin < total) & (rank < cap), rank, cap)
    uniq = jnp.full((cap + 1,), total, dtype=jnp.int32).at[slot].set(
        lin.astype(jnp.int32), mode="drop"
    )[:cap]

    out_mask = uniq < total
    z = uniq // (nyo * nxo)
    rem = uniq - z * nyo * nxo
    y = rem // nxo
    x = rem - y * nxo
    out_coords = jnp.where(out_mask[:, None], jnp.stack([z, y, x], 1), 0).astype(
        jnp.int32
    )
    return out_coords, out_mask


def _out_dim(i, kernel, stride, padding):
    return (i + 2 * padding - kernel) // stride + 1


def strided_out_shape(shape, kernel, stride, padding):
    kernel = np.broadcast_to(np.asarray(kernel), (3,))
    stride = np.broadcast_to(np.asarray(stride), (3,))
    padding = np.broadcast_to(np.asarray(padding), (3,))
    return tuple(
        int(_out_dim(shape[d], kernel[d], stride[d], padding[d])) for d in range(3)
    )


def downsample_coords(coords, mask, shape, kernel, stride, padding, cap):
    """Active output sites of a strided sparse conv (per sample).

    Returns (out_coords (cap, 3) sorted, out_mask (cap,)). A site j (per dim)
    is a candidate of input i iff ceil((i+p-k+1)/s) <= j <= floor((i+p)/s);
    for the k=3, s<=2 cases used here that is at most 2 values per dim.
    """
    kernel = np.broadcast_to(np.asarray(kernel), (3,))
    stride = np.broadcast_to(np.asarray(stride), (3,))
    padding = np.broadcast_to(np.asarray(padding), (3,))
    out_shape = strided_out_shape(shape, kernel, stride, padding)

    cand_per_dim = []
    valid_per_dim = []
    for d in range(3):
        i = coords[:, d]
        # integer-exact ceil/floor division (coords may be near 0)
        j_lo = -((-(i + int(padding[d]) - int(kernel[d]) + 1)) // int(stride[d]))
        j_hi = (i + int(padding[d])) // int(stride[d])
        # two candidates (may coincide); clamp into out grid
        c0, c1 = j_lo, jnp.minimum(j_lo + 1, j_hi)
        cand = jnp.stack([c0, c1], axis=1)  # (N, 2)
        valid = (cand >= 0) & (cand < out_shape[d]) & (cand <= j_hi[:, None])
        # dedupe the coincident pair
        valid = valid & jnp.stack(
            [jnp.ones_like(c0, bool), c1 > c0], axis=1
        )
        cand_per_dim.append(cand)
        valid_per_dim.append(valid)

    # cartesian product of per-dim candidates: (N, 2, 2, 2)
    cz = cand_per_dim[0][:, :, None, None]
    cy = cand_per_dim[1][:, None, :, None]
    cx = cand_per_dim[2][:, None, None, :]
    vz = valid_per_dim[0][:, :, None, None]
    vy = valid_per_dim[1][:, None, :, None]
    vx = valid_per_dim[2][:, None, None, :]
    valid = (vz & vy & vx) & mask[:, None, None, None]

    nzo, nyo, nxo = out_shape
    big = jnp.int32(nzo * nyo * nxo)
    lin = (cz * nyo + cy) * nxo + cx
    lin = jnp.where(valid, lin, big).reshape(-1)

    sorted_lin = jnp.sort(lin)
    is_new = jnp.concatenate(
        [sorted_lin[:1] < big, (jnp.diff(sorted_lin) > 0) & (sorted_lin[1:] < big)]
    )
    rank = jnp.cumsum(is_new) - 1
    scatter_idx = jnp.where(is_new & (rank < cap), rank, cap)
    uniq = jnp.full((cap + 1,), big, dtype=jnp.int32).at[scatter_idx].set(
        sorted_lin, mode="drop"
    )[:cap]

    out_mask = uniq < big
    z = uniq // (nyo * nxo)
    rem = uniq - z * nyo * nxo
    y = rem // nxo
    x = rem - y * nxo
    out_coords = jnp.where(out_mask[:, None], jnp.stack([z, y, x], 1), 0).astype(
        jnp.int32
    )
    return out_coords, out_mask


def build_strided_neighbor_map(out_coords, out_mask, out_shape, in_coords,
                               in_mask, in_shape, kernel, stride, padding):
    """(M, prod(kernel)) input indices for each output site (per sample)."""
    kernel = np.broadcast_to(np.asarray(kernel), (3,))
    stride_a = np.asarray(np.broadcast_to(np.asarray(stride), (3,)), dtype=np.int32)
    padding_a = np.asarray(np.broadcast_to(np.asarray(padding), (3,)), dtype=np.int32)

    kz, ky, kx = int(kernel[0]), int(kernel[1]), int(kernel[2])
    off = np.stack(
        np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx), indexing="ij"), -1
    ).reshape(-1, 3)
    off = jnp.asarray(off, dtype=jnp.int32)  # (K, 3)

    base = out_coords * jnp.asarray(stride_a) - jnp.asarray(padding_a)  # (M, 3)
    ncoords = base[:, None, :] + off[None]  # (M, K, 3)
    bounds = jnp.array(in_shape, dtype=jnp.int32)
    inb = jnp.all((ncoords >= 0) & (ncoords < bounds), axis=-1) & out_mask[:, None]

    lin, big = _lin_ids(in_coords, in_mask, in_shape)
    n = in_coords.shape[0]
    nlin = (ncoords[..., 0] * in_shape[1] + ncoords[..., 1]) * in_shape[2] + ncoords[..., 2]
    nlin = jnp.where(inb, nlin, big)
    idx = jnp.searchsorted(lin, nlin.reshape(-1), method="sort").reshape(
        nlin.shape
    )
    found = (idx < n) & (jnp.take(lin, jnp.minimum(idx, n - 1)) == nlin) & inb
    return jnp.where(found, idx, n).astype(jnp.int32)


class SparseConv(nn.Module):
    """Gather-matmul sparse conv given a precomputed neighbor map.

    Covers both submanifold (nmap over input sites) and strided (nmap over
    output sites) cases — the map decides the geometry.
    """

    features: int
    num_kernel: int = 27
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats, nmap):
        # feats (B, N, Cin), nmap (B, M, K) -> (B, M, Cout)
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.num_kernel * cin, self.features),
        )
        gathered = jax.vmap(_gather_padded)(feats, nmap)  # (B, M, K, Cin)
        b, m = gathered.shape[:2]
        y = gathered.reshape(b, m, self.num_kernel * cin) @ w
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class SubMBlock(nn.Module):
    """SubMConv3d + BN + ReLU (the conv_input pattern, scn.py:110-115)."""

    features: int

    @nn.compact
    def __call__(self, feats, nmap, mask, train: bool = True):
        y = SparseConv(self.features, use_bias=False)(feats, nmap)
        y = MaskedBatchNorm(use_running_average=not train)(y, mask)
        return nn.relu(y)


class SparseBasicBlock(nn.Module):
    """Two submanifold 3x3x3 convs with residual (scn.py:51-95)."""

    features: int

    @nn.compact
    def __call__(self, feats, nmap, mask, train: bool = True):
        identity = feats
        y = SparseConv(self.features)(feats, nmap)
        y = MaskedBatchNorm(use_running_average=not train)(y, mask)
        y = nn.relu(y)
        y = SparseConv(self.features)(y, nmap)
        y = MaskedBatchNorm(use_running_average=not train)(y, mask)
        y = nn.relu(y + identity)
        return y * mask[..., None]


class SparseDownBlock(nn.Module):
    """SparseConv3d(stride) + BN + ReLU, then `num_res` SparseBasicBlocks.

    Mirrors one conv2/conv3/conv4 stage of SpMiddleResNetFHD
    (scn.py:120-155).
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: Sequence[int] = (2, 2, 2)
    padding: Sequence[int] = (1, 1, 1)
    cap: int = 0  # output capacity; 0 = same as input
    num_res: int = 2
    index_method: str = "dense"  # 'dense' table or 'binary' searchsorted

    @nn.compact
    def __call__(self, grid: SparseGrid, train: bool = True):
        cap = self.cap or grid.features.shape[1]
        out_shape = strided_out_shape(grid.shape, self.kernel, self.stride,
                                      self.padding)
        down_fn = (downsample_coords_dense if self.index_method == "dense"
                   else downsample_coords)
        out_coords, out_mask = jax.vmap(
            lambda c, m: down_fn(
                c, m, grid.shape, self.kernel, self.stride, self.padding, cap
            )
        )(grid.coords, grid.mask)

        if self.index_method == "dense":
            kz, ky, kx = (int(k) for k in np.broadcast_to(
                np.asarray(self.kernel), (3,)))
            off = np.stack(
                np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx),
                            indexing="ij"), -1,
            ).reshape(-1, 3)
            off = jnp.asarray(off, dtype=jnp.int32)
            stride_a = jnp.asarray(
                np.broadcast_to(np.asarray(self.stride), (3,)).astype(np.int32))
            pad_a = jnp.asarray(
                np.broadcast_to(np.asarray(self.padding), (3,)).astype(np.int32))
            n_rows = grid.features.shape[1]

            def one_map(oc, om, ic, im):
                table = build_index_table(ic, im, grid.shape)
                base = oc * stride_a - pad_a
                return lookup_neighbors(table, grid.shape, base, om, off,
                                        n_rows)

            nmap = jax.vmap(one_map)(out_coords, out_mask, grid.coords,
                                     grid.mask)
        else:
            nmap = jax.vmap(
                lambda oc, om, ic, im: build_strided_neighbor_map(
                    oc, om, out_shape, ic, im, grid.shape,
                    self.kernel, self.stride, self.padding,
                )
            )(out_coords, out_mask, grid.coords, grid.mask)

        k = int(np.prod(self.kernel))
        y = SparseConv(self.features, num_kernel=k, use_bias=False)(
            grid.features, nmap
        )
        y = MaskedBatchNorm(use_running_average=not train)(y, out_mask)
        y = nn.relu(y)

        out = SparseGrid(y, out_coords, out_mask, out_shape)
        if self.num_res:
            subm_fn = (build_subm_neighbor_map_dense
                       if self.index_method == "dense"
                       else build_subm_neighbor_map)
            sub_nmap = jax.vmap(
                lambda c, m: subm_fn(c, m, out_shape)
            )(out_coords, out_mask)
            feats = out.features
            for _ in range(self.num_res):
                feats = SparseBasicBlock(self.features)(
                    feats, sub_nmap, out_mask, train
                )
            out = out._replace(features=feats)
        return out


def sparse_to_dense(grid: SparseGrid):
    """Scatter (B, N, C) into a dense (B, nz, ny, nx, C) tensor."""
    nz, ny, nx = grid.shape
    b, n, c = grid.features.shape

    def one(feats, coords, mask):
        lin = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
        lin = jnp.where(mask, lin, nz * ny * nx)
        dense = jnp.zeros((nz * ny * nx + 1, c), feats.dtype)
        dense = dense.at[lin].set(jnp.where(mask[:, None], feats, 0.0))
        return dense[:-1].reshape(nz, ny, nx, c)

    return jax.vmap(one)(grid.features, grid.coords, grid.mask)

"""Voxelization: host (numpy, bit-parity with the numba kernels) and device
(jnp, fixed-capacity segment ops).

Host path re-implements the first-come-first-served hard voxelizer of the
reference (/root/reference/det3d/ops/point_cloud/point_cloud_ops.py:8-74) as
vectorized numpy: voxels are emitted in order of first point occurrence,
each voxel keeps its first ``max_points`` points in stream order, and voxels
past ``max_voxels`` are dropped.

Device path is the TPU-native dynamic voxelizer: padded points -> sorted
linear cell ids -> capacity-bounded unique -> ``segment_sum`` mean features.
This replaces both the numba hard voxelizer + mean VFE
(readers/voxel_encoder.py:15-22) and torch_scatter dynamic encoders
(readers/voxel_encoder.py:25-45) with one fused, jittable op.

Coordinate layout matches the reference: ``coords`` rows are reversed point
dims, i.e. (z, azimuth, range) for cylinder grids (point dims rho, phi, z).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


class VoxelGenerator:
    """Host hard voxelizer (VoxelGenerator + points_to_voxel equivalent)."""

    def __init__(self, voxel_size, point_cloud_range, max_num_points,
                 max_voxels=20000):
        self.voxel_size = np.asarray(voxel_size, dtype=np.float32)
        self.point_cloud_range = np.asarray(point_cloud_range, dtype=np.float32)
        self.max_num_points = max_num_points
        self.max_voxels = max_voxels
        grid = (self.point_cloud_range[3:] - self.point_cloud_range[:3]) / self.voxel_size
        self.grid_size = np.round(grid).astype(np.int64)

    def generate(self, points, max_voxels=-1):
        if max_voxels == -1:
            max_voxels = self.max_voxels
        from .. import native

        if native.available() and points.dtype == np.float32:
            return native.points_to_voxel(
                points, self.voxel_size, self.point_cloud_range,
                self.max_num_points, max_voxels,
            )
        return points_to_voxel(
            points, self.voxel_size, self.point_cloud_range,
            self.max_num_points, max_voxels,
        )


def points_to_voxel(points, voxel_size, pc_range, max_points, max_voxels):
    """Vectorized FCFS hard voxelization.

    Returns (voxels (V, max_points, C), coords (V, 3) int32 reversed-dims,
    num_points_per_voxel (V,) int32).
    """
    voxel_size = np.asarray(voxel_size, dtype=np.float32)
    pc_range = np.asarray(pc_range, dtype=np.float32)
    grid_size = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int64)

    coords_f = np.floor((points[:, :3] - pc_range[:3]) / voxel_size)
    valid = np.all((coords_f >= 0) & (coords_f < grid_size), axis=1)
    pts = points[valid]
    coords = coords_f[valid].astype(np.int64)

    # linear id in reversed-dim (z-major) order so voxel identity matches the
    # numba kernel's coor_to_voxelidx indexing
    lin = (coords[:, 2] * grid_size[1] + coords[:, 1]) * grid_size[0] + coords[:, 0]

    uniq, first_idx, inverse = np.unique(lin, return_index=True, return_inverse=True)
    # order voxels by first point occurrence (FCFS voxel ids)
    order = np.argsort(first_idx, kind="stable")
    rank_of_uniq = np.empty_like(order)
    rank_of_uniq[order] = np.arange(len(order))
    voxel_of_point = rank_of_uniq[inverse]

    keep_voxel = voxel_of_point < max_voxels
    # slot of each point within its voxel, in stream order
    sort_by_voxel = np.argsort(voxel_of_point, kind="stable")
    counts = np.bincount(voxel_of_point, minlength=len(uniq))
    group_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot_sorted = np.arange(len(voxel_of_point)) - group_start[voxel_of_point[sort_by_voxel]]
    slot = np.empty_like(slot_sorted)
    slot[sort_by_voxel] = slot_sorted

    keep = keep_voxel & (slot < max_points)
    n_vox = min(len(uniq), max_voxels)

    voxels = np.zeros((n_vox, max_points, points.shape[1]), dtype=points.dtype)
    voxels[voxel_of_point[keep], slot[keep]] = pts[keep]
    num_points = np.minimum(counts[:n_vox], max_points).astype(np.int32)

    coors = np.zeros((n_vox, 3), dtype=np.int32)
    first_point = first_idx[order[:n_vox]]
    coors[:, 0] = coords[first_point, 2]  # z
    coors[:, 1] = coords[first_point, 1]  # azimuth / y
    coors[:, 2] = coords[first_point, 0]  # range / x
    return voxels, coors, num_points


@functools.partial(
    jax.jit, static_argnames=("grid_size", "max_voxels", "return_point_voxel")
)
def dynamic_voxelize(points, points_mask, voxel_size, pc_range, grid_size,
                     max_voxels, return_point_voxel=False):
    """Device dynamic voxelization with mean pooling.

    Args:
      points: (P, C) padded point buffer, first 3 dims are grid coordinates
        (rho, phi, z for cylinder layout).
      points_mask: (P,) bool validity of each point row.
      voxel_size, pc_range: (3,), (6,) float arrays.
      grid_size: static (nx, ny, nz) python tuple.
      max_voxels: static capacity V.

    Returns dict with:
      features: (V, C) per-voxel mean of member points
      coords:   (V, 3) int32 (z, y, x) reversed-dim coords
      mask:     (V,) bool voxel validity
      num_points: (V,) int32 member counts
      point_voxel (optional): (P,) int32 voxel slot of each point (V if
        invalid/overflow) for seg label lookup and pillar decorations.
    """
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    P = points.shape[0]
    V = max_voxels

    coords = jnp.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((coords >= 0) & (coords < jnp.array([nx, ny, nz])), axis=1)
    valid = points_mask & in_range

    big = jnp.int32(nx * ny * nz)
    lin = (coords[:, 2] * ny + coords[:, 1]) * nx + coords[:, 0]
    lin = jnp.where(valid, lin, big)

    sorted_lin = jnp.sort(lin)
    is_new = jnp.concatenate(
        [sorted_lin[:1] < big,
         (jnp.diff(sorted_lin) > 0) & (sorted_lin[1:] < big)]
    )
    rank = jnp.cumsum(is_new) - 1  # unique-voxel rank of each sorted position
    # capacity-bounded table of unique linear ids, padded with `big`
    scatter_idx = jnp.where(is_new & (rank < V), rank, V)
    uniq = jnp.full((V + 1,), big, dtype=jnp.int32).at[scatter_idx].set(
        sorted_lin, mode="drop"
    )[:V]

    point_voxel = jnp.searchsorted(uniq, lin, method="sort")  # (P,) in [0, V]
    hit = (point_voxel < V) & valid
    pv_safe = jnp.where(hit & (uniq[jnp.minimum(point_voxel, V - 1)] == lin),
                        point_voxel, V)

    seg = jnp.where(hit, pv_safe, V)
    feats = jax.ops.segment_sum(
        jnp.where((seg < V)[:, None], points, 0.0), seg, num_segments=V + 1
    )[:V]
    counts = jax.ops.segment_sum(
        (seg < V).astype(jnp.int32), seg, num_segments=V + 1
    )[:V]
    mean = feats / jnp.maximum(counts, 1)[:, None]

    vmask = uniq < big
    z = uniq // (nx * ny)
    rem = uniq - z * nx * ny
    y = rem // nx
    x = rem - y * nx
    out_coords = jnp.where(
        vmask[:, None], jnp.stack([z, y, x], axis=1), 0
    ).astype(jnp.int32)

    out = {
        "features": jnp.where(vmask[:, None], mean, 0.0),
        "coords": out_coords,
        "mask": vmask,
        "num_points": jnp.where(vmask, counts, 0),
    }
    if return_point_voxel:
        out["point_voxel"] = seg.astype(jnp.int32)
    return out


def points_to_bev(points, voxel_size, pc_range, with_reflectivity=False,
                  max_voxels=40000):
    """KITTI-style BEV map builder — vectorized port of the reference's
    numba kernel (/root/reference/det3d/ops/point_cloud/bev_ops.py:8-117;
    a SECOND-lineage utility with no in-tree callers, kept for API parity).

    Returns (n_z + 1 [+1], H, W): per-height-slice normalized max height,
    a last channel of per-cell point counts, and (optionally) a
    reflectivity channel.

    Parity notes vs. the reference kernel:
    - ``max_voxels`` matches the reference's early ``break``
      (bev_ops.py:46-50): once the (max_voxels+1)-th DISTINCT occupied 3-D
      cell would be created, the kernel stops — all later points (even in
      already-open cells) are dropped. We truncate to the same point
      prefix.
    - reflectivity DEVIATES deliberately: the reference writes the
      intensity of whichever point last improved any z-slice's height max
      at (y, x) — an iteration-order-dependent value (bev_ops.py:55-62).
      We write the intensity of the column's overall highest point, which
      is deterministic and coincides with the reference whenever the
      column's global-highest point is processed last among its slice
      maxima.
    """
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    pc_range = np.asarray(pc_range, dtype=points.dtype)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int32)
    nx, ny, nz = int(grid[0]), int(grid[1]), int(grid[2])

    coords = np.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(np.int64)
    ok = np.all((coords >= 0) & (coords < grid), axis=1)
    pts, coords = points[ok], coords[ok]

    lin3 = (coords[:, 2] * ny + coords[:, 1]) * nx + coords[:, 0]
    _, first_idx = np.unique(lin3, return_index=True)
    if len(first_idx) > max_voxels:
        cutoff = np.sort(first_idx)[max_voxels]
        pts, coords, lin3 = pts[:cutoff], coords[:cutoff], lin3[:cutoff]

    shape = [nz + 1 + int(with_reflectivity), ny, nx]
    bev = np.zeros(shape, dtype=points.dtype)

    height_lowers = np.linspace(pc_range[2], pc_range[5], nz, endpoint=False)
    hnorm = (pts[:, 2] - height_lowers[coords[:, 2]]) / voxel_size[2]

    flat = np.zeros(nz * ny * nx, dtype=points.dtype)
    np.maximum.at(flat, lin3, hnorm)
    bev[:nz] = flat.reshape(nz, ny, nx)

    lin2 = coords[:, 1] * nx + coords[:, 0]
    bev[-1] = np.bincount(lin2, minlength=ny * nx).reshape(ny, nx
                                                           ).astype(points.dtype)

    if with_reflectivity and pts.shape[1] > 3:
        # intensity of each column's highest point: sort so the max-z point
        # of every (y, x) column lands last, then scatter
        order = np.lexsort((pts[:, 2], lin2))
        refl = np.zeros(ny * nx, dtype=points.dtype)
        refl[lin2[order]] = pts[order, 3]
        bev[-2] = refl.reshape(ny, nx)
    return bev

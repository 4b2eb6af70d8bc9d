import numpy as np
import jax.numpy as jnp

from partner_tpu.ops import voxelize


def _reference_fcfs_voxelize(points, voxel_size, pc_range, max_points, max_voxels):
    """Straight python port of the numba FCFS kernel semantics (oracle)."""
    voxel_size = np.asarray(voxel_size, np.float32)
    pc_range = np.asarray(pc_range, np.float32)
    grid_size = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int64)
    coor_to_idx = {}
    voxels, coors, nums = [], [], []
    for p in points:
        c = np.floor((p[:3] - pc_range[:3]) / voxel_size).astype(np.int64)
        if np.any(c < 0) or np.any(c >= grid_size):
            continue
        key = (c[2], c[1], c[0])
        if key not in coor_to_idx:
            if len(voxels) >= max_voxels:
                continue
            coor_to_idx[key] = len(voxels)
            voxels.append(np.zeros((max_points, points.shape[1]), points.dtype))
            coors.append(np.array(key, np.int32))
            nums.append(0)
        vi = coor_to_idx[key]
        if nums[vi] < max_points:
            voxels[vi][nums[vi]] = p
            nums[vi] += 1
    if not voxels:
        return (np.zeros((0, max_points, points.shape[1])), np.zeros((0, 3), np.int32),
                np.zeros((0,), np.int32))
    return np.stack(voxels), np.stack(coors), np.array(nums, np.int32)


VS = [0.5, 0.1, 0.4]
PR = [0.0, -3.2, -2.0, 20.0, 3.2, 2.0]


def make_polar_points(rng, n=2000):
    pts = np.zeros((n, 5), dtype=np.float32)
    pts[:, 0] = rng.uniform(-1, 21, n)  # rho incl. out-of-range
    pts[:, 1] = rng.uniform(-3.3, 3.3, n)
    pts[:, 2] = rng.uniform(-2.5, 2.5, n)
    pts[:, 3:] = rng.randn(n, 2)
    return pts


class TestHostVoxelizer:
    def test_matches_fcfs_oracle(self, rng):
        pts = make_polar_points(rng)
        got = voxelize.points_to_voxel(pts, VS, PR, max_points=5, max_voxels=100000)
        exp = _reference_fcfs_voxelize(pts, VS, PR, 5, 100000)
        np.testing.assert_array_equal(got[1], exp[1])
        np.testing.assert_array_equal(got[2], exp[2])
        np.testing.assert_allclose(got[0], exp[0])

    def test_max_voxels_cap(self, rng):
        pts = make_polar_points(rng)
        got = voxelize.points_to_voxel(pts, VS, PR, max_points=3, max_voxels=50)
        exp = _reference_fcfs_voxelize(pts, VS, PR, 3, 50)
        assert got[0].shape[0] == 50
        np.testing.assert_array_equal(got[1], exp[1])
        np.testing.assert_allclose(got[0], exp[0])

    def test_generator_grid_size(self):
        gen = voxelize.VoxelGenerator(
            [0.065, 0.00307, 0.15], [0.3, -3.14368, -2.0, 75.18, 3.14368, 4.0],
            5, 150000,
        )
        np.testing.assert_array_equal(gen.grid_size, [1152, 2048, 40])


class TestDeviceVoxelizer:
    def test_mean_features_match_host(self, rng):
        pts = make_polar_points(rng, 1500)
        pad = np.zeros((2048, 5), np.float32)
        pad[:1500] = pts
        mask = np.zeros((2048,), bool)
        mask[:1500] = True

        grid = tuple(
            int(x) for x in np.round(
                (np.array(PR[3:]) - np.array(PR[:3])) / np.array(VS)
            )
        )
        out = voxelize.dynamic_voxelize(
            jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(VS, dtype=jnp.float32),
            jnp.asarray(PR, dtype=jnp.float32), grid, max_voxels=4096,
            return_point_voxel=True,
        )
        # host: mean over ALL points per voxel (max_points large)
        hv, hc, hn = voxelize.points_to_voxel(pts, VS, PR, 64, 100000)
        host_means = hv.sum(1) / hn[:, None]

        got_coords = np.asarray(out["coords"])[np.asarray(out["mask"])]
        got_feats = np.asarray(out["features"])[np.asarray(out["mask"])]
        assert got_coords.shape[0] == hc.shape[0]

        # match voxels by coordinate key
        def key(c):
            return c[:, 0] * 10**9 + c[:, 1] * 10**4 + c[:, 2]

        host_order = np.argsort(key(hc))
        dev_order = np.argsort(key(got_coords))
        np.testing.assert_array_equal(hc[host_order], got_coords[dev_order])
        np.testing.assert_allclose(
            host_means[host_order], got_feats[dev_order], rtol=1e-4, atol=1e-4
        )

    def test_capacity_overflow_masked(self, rng):
        pts = make_polar_points(rng, 1000)
        pad = np.zeros((1024, 5), np.float32)
        pad[:1000] = pts
        mask = np.zeros((1024,), bool)
        mask[:1000] = True
        grid = tuple(
            int(x) for x in np.round(
                (np.array(PR[3:]) - np.array(PR[:3])) / np.array(VS)
            )
        )
        out = voxelize.dynamic_voxelize(
            jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(VS, dtype=jnp.float32),
            jnp.asarray(PR, dtype=jnp.float32), grid, max_voxels=16,
        )
        assert int(np.asarray(out["mask"]).sum()) == 16
        # all retained voxels have valid coords inside grid
        c = np.asarray(out["coords"])
        assert (c >= 0).all()
        assert (c[:, 0] < grid[2]).all() and (c[:, 2] < grid[0]).all()


def test_points_to_bev_matches_bruteforce(rng):
    """Vectorized BEV map builder vs a per-point oracle
    (reference bev_ops.py:8-117)."""
    from partner_tpu.ops.voxelize import points_to_bev

    n = 2000
    pts = np.concatenate(
        [rng.uniform(0, 10, (n, 3)), rng.rand(n, 1)], 1
    ).astype(np.float32)
    vs = np.array([0.5, 0.5, 2.0], np.float32)
    pr = np.array([0, 0, 0, 10, 10, 10], np.float32)
    bev = points_to_bev(pts, vs, pr, with_reflectivity=True)
    nz, ny, nx = 5, 20, 20
    assert bev.shape == (nz + 2, ny, nx)

    # oracle
    want_h = np.zeros((nz, ny, nx), np.float32)
    want_cnt = np.zeros((ny, nx), np.float32)
    lowers = np.linspace(0, 10, nz, endpoint=False)
    for p in pts:
        cx, cy, cz = (int(np.floor(p[0] / 0.5)), int(np.floor(p[1] / 0.5)),
                      int(np.floor(p[2] / 2.0)))
        if not (0 <= cx < nx and 0 <= cy < ny and 0 <= cz < nz):
            continue
        hn = (p[2] - lowers[cz]) / 2.0
        want_h[cz, cy, cx] = max(want_h[cz, cy, cx], hn)
        want_cnt[cy, cx] += 1
    np.testing.assert_allclose(bev[:nz], want_h, atol=1e-5)
    np.testing.assert_allclose(bev[-1], want_cnt)

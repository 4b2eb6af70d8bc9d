"""Native C++ host kernels vs. their numpy oracles.

The native package (partner_tpu/native) replaces the reference's numba JIT
hot loops (/root/reference/det3d/ops/point_cloud/point_cloud_ops.py:8-74,
core/sampler/preprocess.py:855-938). These tests assert bit-parity with the
vectorized-numpy implementations that double as oracles.
"""

import numpy as np
import pytest

from partner_tpu import native
from partner_tpu.core import box_np_ops
from partner_tpu.data.augment import box_collision_test_np
from partner_tpu.ops.voxelize import points_to_voxel

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_cloud(rng, n=5000, c=5):
    pts = np.empty((n, c), np.float32)
    pts[:, 0] = rng.uniform(0.5, 74.5, n)       # rho
    pts[:, 1] = rng.uniform(-np.pi, np.pi, n)   # phi
    pts[:, 2] = rng.uniform(-1.9, 3.9, n)       # z
    pts[:, 3:] = rng.rand(n, c - 3)
    return pts


VS = np.array([0.3, 0.02, 0.2], np.float32)
PR = np.array([0.0, -np.pi, -2.0, 75.0, np.pi, 4.0], np.float32)


def test_voxelizer_parity(rng):
    pts = _random_cloud(rng)
    for max_points, max_voxels in [(5, 100000), (3, 64), (1, 4000)]:
        v0, c0, n0 = points_to_voxel(pts, VS, PR, max_points, max_voxels)
        v1, c1, n1 = native.points_to_voxel(pts, VS, PR, max_points,
                                            max_voxels)
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_array_equal(n0, n1)
        np.testing.assert_array_equal(v0, v1)


def test_voxelizer_dense_collisions(rng):
    # many points per voxel: coarse grid forces heavy capping
    pts = _random_cloud(rng, n=20000)
    vs = np.array([5.0, 0.5, 1.0], np.float32)
    v0, c0, n0 = points_to_voxel(pts, vs, PR, 8, 500)
    v1, c1, n1 = native.points_to_voxel(pts, vs, PR, 8, 500)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(n0, n1)
    np.testing.assert_array_equal(v0, v1)


def test_voxelizer_out_of_range_points(rng):
    pts = _random_cloud(rng, n=1000)
    pts[::7, 0] = 200.0   # beyond rho range
    pts[::11, 2] = -50.0  # below z range
    v0, c0, n0 = points_to_voxel(pts, VS, PR, 5, 10000)
    v1, c1, n1 = native.points_to_voxel(pts, VS, PR, 5, 10000)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(v0, v1)


def test_box_collision_parity(rng):
    def corners(boxes):
        return box_np_ops.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 2:4], boxes[:, 4]
        ).astype(np.float32)

    boxes_a = np.stack([rng.uniform(-20, 20, 40), rng.uniform(-20, 20, 40),
                        rng.uniform(1, 6, 40), rng.uniform(1, 3, 40),
                        rng.uniform(-np.pi, np.pi, 40)], 1)
    boxes_b = np.stack([rng.uniform(-20, 20, 30), rng.uniform(-20, 20, 30),
                        rng.uniform(1, 6, 30), rng.uniform(1, 3, 30),
                        rng.uniform(-np.pi, np.pi, 30)], 1)
    ca, cb = corners(boxes_a), corners(boxes_b)
    got = native.box_collision_test(ca, cb)
    want = box_collision_test_np(ca, cb)
    # float32-vs-double epsilon at exact-tangency can differ; random rects
    # are never tangent to 1e-6, so demand exact agreement
    np.testing.assert_array_equal(got, want)


def test_box_collision_known_cases():
    sq = np.array([[[0, 0], [1, 0], [1, 1], [0, 1]]], np.float32)
    far = sq + np.array([5.0, 0.0], np.float32)
    touch = sq + np.array([1.0 + 1e-3, 0.0], np.float32)
    overlap = sq + np.array([0.5, 0.5], np.float32)
    assert not native.box_collision_test(sq, far)[0, 0]
    assert not native.box_collision_test(sq, touch)[0, 0]
    assert native.box_collision_test(sq, overlap)[0, 0]


def test_points_in_rbbox_parity(rng):
    pts = rng.uniform(-30, 30, (4000, 5)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(-20, 20, 12), rng.uniform(-20, 20, 12),
        rng.uniform(-1, 1, 12),
        rng.uniform(2, 6, 12), rng.uniform(1, 3, 12), rng.uniform(1, 2, 12),
        rng.uniform(-np.pi, np.pi, 12),
    ], 1).astype(np.float32)
    got = native.points_in_rbbox(pts, boxes)
    want = box_np_ops.points_in_rbbox_np(pts, boxes)
    assert (got != want).mean() < 1e-4  # boundary-epsilon disagreements only
    # 9-dim boxes (with velocity columns) read yaw from the last column
    boxes9 = np.concatenate(
        [boxes[:, :6], np.zeros((12, 2), np.float32), boxes[:, 6:]], 1
    )
    np.testing.assert_array_equal(native.points_in_rbbox(pts, boxes9), got)


def test_dispatchers_use_native(rng):
    """The public entry points route through native when available."""
    from partner_tpu.ops.voxelize import VoxelGenerator

    gen = VoxelGenerator(VS, PR, 5, 1000)
    pts = _random_cloud(rng, 2000)
    v, c, n = gen.generate(pts)
    v0, c0, n0 = points_to_voxel(pts, VS, PR, 5, 1000)
    np.testing.assert_array_equal(c, c0)
    np.testing.assert_array_equal(v, v0)

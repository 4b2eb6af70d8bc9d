import numpy as np
import jax.numpy as jnp

from partner_tpu.core import box_np_ops, geometry
from partner_tpu.core.center_coder import CenterCoder


def random_boxes(rng, n, with_vel=False):
    boxes = np.zeros((n, 9 if with_vel else 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-40, 40, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 2, n)
    boxes[:, 3:6] = rng.uniform(0.5, 6, (n, 3))
    boxes[:, -1] = rng.uniform(-np.pi, np.pi, n)
    if with_vel:
        boxes[:, 6:8] = rng.uniform(-5, 5, (n, 2))
    return boxes


class TestTransformPoints:
    def test_cylinder_layout(self, rng):
        pts = rng.randn(100, 5).astype(np.float32)
        out = box_np_ops.transform_points(pts, "cylinder")
        assert out.shape == (100, 7)
        rho = np.hypot(pts[:, 0], pts[:, 1])
        phi = np.arctan2(pts[:, 1], pts[:, 0])
        np.testing.assert_allclose(out[:, 0], rho, rtol=1e-6)
        np.testing.assert_allclose(out[:, 1], phi, rtol=1e-5)
        np.testing.assert_allclose(out[:, 2], pts[:, 2])
        np.testing.assert_allclose(out[:, 3:5], pts[:, :2])
        np.testing.assert_allclose(out[:, 5:], pts[:, 3:])

    def test_cuboid_layout(self, rng):
        pts = rng.randn(50, 4).astype(np.float32)
        out = box_np_ops.transform_points(pts, "cuboid")
        assert out.shape == (50, 6)
        np.testing.assert_allclose(out[:, :4], pts)

    def test_jnp_matches_numpy(self, rng):
        pts = rng.randn(64, 5).astype(np.float32)
        a = box_np_ops.transform_points(pts, "cylinder")
        b = np.asarray(geometry.transform_points(jnp.asarray(pts), "cylinder"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestCorners:
    def test_unrotated_corners(self):
        centers = np.array([[1.0, 2.0]], dtype=np.float32)
        dims = np.array([[2.0, 4.0]], dtype=np.float32)
        corners = box_np_ops.center_to_corner_box2d(centers, dims, np.zeros(1))
        expected = {(0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 0.0)}
        got = {tuple(np.round(c, 5)) for c in corners[0]}
        assert got == expected

    def test_rotation_ccw(self):
        # box along x rotated +90deg becomes along y
        centers = np.zeros((1, 2), dtype=np.float32)
        dims = np.array([[4.0, 2.0]], dtype=np.float32)
        corners = box_np_ops.center_to_corner_box2d(
            centers, dims, np.array([np.pi / 2])
        )
        assert np.abs(corners[0, :, 0]).max() < 1.0 + 1e-5
        assert np.abs(corners[0, :, 1]).max() > 1.9

    def test_jnp_matches_numpy(self, rng):
        boxes = random_boxes(rng, 32)
        a = box_np_ops.center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5], boxes[:, -1])
        b = np.asarray(
            geometry.center_to_corner_box2d(
                jnp.asarray(boxes[:, :2]), jnp.asarray(boxes[:, 3:5]),
                jnp.asarray(boxes[:, -1]),
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_corners_3d_extents(self, rng):
        boxes = random_boxes(rng, 16)
        c = np.asarray(geometry.boxes_to_corners_3d(jnp.asarray(boxes)))
        # z extents are center +/- dz/2 regardless of yaw
        np.testing.assert_allclose(
            c[..., 2].max(1), boxes[:, 2] + boxes[:, 5] / 2, rtol=1e-5
        )
        np.testing.assert_allclose(
            c[..., 2].min(1), boxes[:, 2] - boxes[:, 5] / 2, rtol=1e-5
        )
        # BEV diagonal preserved
        diag = np.hypot(boxes[:, 3], boxes[:, 4])
        bev = c[:, :4, :2]
        d = np.linalg.norm(bev[:, 2] - bev[:, 0], axis=-1)
        np.testing.assert_allclose(d, diag, rtol=1e-4)


class TestLimitPeriod:
    def test_wrap(self):
        vals = np.array([0.0, np.pi + 0.1, -np.pi - 0.1, 7.0, -7.0])
        out = box_np_ops.limit_period(vals)
        assert np.all(out >= -np.pi) and np.all(out < np.pi)
        np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-6)
        np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-6)

    def test_wrap_angle_pi(self):
        vals = jnp.array([3.5, -3.5, 0.2])
        out = np.asarray(geometry.wrap_angle_pi(vals))
        np.testing.assert_allclose(out, [3.5 - 2 * np.pi, -3.5 + 2 * np.pi, 0.2],
                                   rtol=1e-6)


class TestCenterCoder:
    def test_encode_decode_roundtrip(self, rng):
        coder = CenterCoder(code_size=7, encode_angle_by_sincos=True)
        boxes = random_boxes(rng, 64)
        enc = coder.encode(jnp.asarray(boxes))
        assert enc.shape == (64, 8)
        dec = np.asarray(coder.decode(enc))
        np.testing.assert_allclose(dec[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.sin(dec[:, 6]), np.sin(boxes[:, 6]), atol=1e-5
        )

    def test_get_delta_zero_for_perfect_pred(self, rng):
        coder = CenterCoder(code_size=7, encode_angle_by_sincos=True)
        boxes = random_boxes(rng, 8)
        enc = coder.encode(jnp.asarray(boxes))
        delta = np.asarray(coder.get_delta(jnp.asarray(boxes), enc))
        np.testing.assert_allclose(delta, 0.0, atol=1e-5)

    def test_rectify(self):
        coder = CenterCoder(rectify=True)
        # box at azimuth pi/2 with yaw pi/2 -> rectified yaw 0
        box = jnp.array([[0.0, 10.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2]])
        enc = np.asarray(coder.encode(box))
        np.testing.assert_allclose(enc[0, 6], 1.0, atol=1e-6)  # cos 0
        np.testing.assert_allclose(enc[0, 7], 0.0, atol=1e-6)  # sin 0


class TestBevCellCenters:
    def test_polar_grid(self):
        grid = geometry.bev_cell_centers(
            (144, 256), [0.065, 0.00307, 0.15], [0.3, -3.14368, -2.0], 8,
            "cylinder",
        )
        assert grid.shape == (144, 256, 4)
        np.testing.assert_allclose(
            grid[0, 0, 2], 0.3 + 0.5 * 0.065 * 8, rtol=1e-5
        )
        # x^2+y^2 == rho^2
        np.testing.assert_allclose(
            np.hypot(grid[..., 0], grid[..., 1]), grid[..., 2], rtol=1e-5
        )


class TestPointsInRbbox:
    def test_membership(self, rng):
        boxes = np.array([[0, 0, 0, 4, 2, 2, np.pi / 4]], dtype=np.float32)
        inside = np.array([[0, 0, 0], [1.2, 1.2, 0.5]], dtype=np.float32)
        outside = np.array([[1.2, -1.2, 0], [0, 0, 1.5]], dtype=np.float32)
        m = box_np_ops.points_in_rbbox(np.concatenate([inside, outside]), boxes)
        assert m[:2, 0].all()
        assert not m[2:, 0].any()

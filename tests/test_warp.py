"""Ego-motion polar warp vs a scipy oracle + semantic invariants."""

import numpy as np
import pytest

PC_RANGE = np.array([2.0, -np.pi, -2.0, 50.0, np.pi, 4.0], np.float32)


class TestEgoMotionWarp:
    def test_identity_transform_is_identity(self, rng):
        import jax.numpy as jnp

        from partner_tpu.ops.warp import ego_motion_warp_polar

        f = jnp.asarray(rng.rand(1, 32, 24, 4).astype(np.float32))
        tm = jnp.eye(3)[None]
        out = ego_motion_warp_polar(f, tm, PC_RANGE)
        np.testing.assert_allclose(np.asarray(out), np.asarray(f),
                                   rtol=1e-5, atol=1e-5)

    def test_pure_rotation_is_azimuth_roll(self, rng):
        """Ego yaw by exactly k cells rolls the map along azimuth."""
        import jax.numpy as jnp

        from partner_tpu.ops.warp import ego_motion_warp_polar, \
            make_bev_transform

        n_az = 32
        k = 5
        dtheta = 2 * np.pi * k / n_az
        f = jnp.asarray(rng.rand(1, n_az, 24, 4).astype(np.float32))
        tm = make_bev_transform(jnp.zeros(1), jnp.zeros(1),
                                jnp.full((1,), dtheta))
        out = np.asarray(ego_motion_warp_polar(f, tm, PC_RANGE))
        # world content fixed, ego rotates by +dtheta -> content appears
        # shifted by -k cells in the new frame
        want = np.roll(np.asarray(f), -k, axis=1)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    def test_matches_scipy_oracle(self, rng):
        import jax.numpy as jnp
        from scipy.ndimage import map_coordinates as sp_map

        from partner_tpu.ops.warp import (ego_motion_warp_polar,
                                          make_bev_transform,
                                          polar_cell_centers)

        n_az, n_r, c = 40, 30, 3
        f = rng.rand(1, n_az, n_r, c).astype(np.float32)
        dx, dy, dth = 0.8, -0.4, 0.13
        tm = make_bev_transform(jnp.asarray([dx]), jnp.asarray([dy]),
                                jnp.asarray([dth]))
        got = np.asarray(ego_motion_warp_polar(
            jnp.asarray(f), tm, PC_RANGE))[0]

        rho, phi = (np.asarray(a) for a in
                    polar_cell_centers(n_az, n_r, PC_RANGE))
        x, y = rho * np.cos(phi), rho * np.sin(phi)
        t = np.asarray(tm[0])
        px = t[0, 0] * x + t[0, 1] * y + t[0, 2]
        py = t[1, 0] * x + t[1, 1] * y + t[1, 2]
        pr = np.hypot(px, py)
        pp = np.arctan2(py, px)
        gr = (pr - PC_RANGE[0]) / (PC_RANGE[3] - PC_RANGE[0]) * n_r - 0.5
        gp = np.mod((pp - PC_RANGE[1]) / (PC_RANGE[4] - PC_RANGE[1])
                    * n_az - 0.5, n_az)
        fpad = np.concatenate([f[0], f[0][:1]], axis=0)
        want = np.stack([
            sp_map(fpad[..., ch], [gp, gr], order=1, mode="constant")
            for ch in range(c)], -1)
        valid = (pr >= PC_RANGE[0]) & (pr <= PC_RANGE[3])
        want *= valid[..., None]
        # scipy and jax handle half-out-of-range bilinear samples
        # differently; compare strictly interior sample points
        interior = (gr >= 0.5) & (gr <= n_r - 1.5)
        np.testing.assert_allclose(got[interior], want[interior],
                                   rtol=1e-4, atol=1e-5)
        assert interior.mean() > 0.8

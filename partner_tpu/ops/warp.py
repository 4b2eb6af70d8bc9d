"""Ego-motion feature warping on polar BEV grids.

Re-implements the reference's grid_sample-based previous-sweep feature
alignment (/root/reference/det3d/models/detectors/polarstream.py:318-381):
the previous sweep's BEV map is resampled so features line up with the
current ego frame. TPU-native form: closed-form coordinate math + bilinear
gather via jax.scipy.ndimage.map_coordinates, with cyclic handling of the
azimuth axis (the polar grid wraps at +-pi).
"""

import jax
import jax.numpy as jnp


def polar_cell_centers(n_az, n_r, pc_range):
    """(n_az, n_r) grids of rho/phi cell centers."""
    r0, phi0, _, r1, phi1 = pc_range[0], pc_range[1], pc_range[2], \
        pc_range[3], pc_range[4]
    rho = r0 + (jnp.arange(n_r) + 0.5) * (r1 - r0) / n_r
    phi = phi0 + (jnp.arange(n_az) + 0.5) * (phi1 - phi0) / n_az
    return jnp.broadcast_to(rho[None], (n_az, n_r)), \
        jnp.broadcast_to(phi[:, None], (n_az, n_r))


def ego_motion_warp_polar(features, transform, pc_range, cyclic=True):
    """Resample previous-sweep polar BEV features into the current frame.

    Args:
      features: (B, n_az, n_r, C) previous-sweep BEV map (its own frame).
      transform: (B, 3, 3) 2D homogeneous current->previous ego transform
        (rotation + translation in the BEV plane; the reference builds it
        from consecutive ego poses).
      pc_range: (6,) [r0, phi0, z0, r1, phi1, z1].
      cyclic: wrap the azimuth axis (full-sweep grids).
    Returns:
      (B, n_az, n_r, C) warped features; cells that fall outside the radial
      range are zeroed.
    """
    b, n_az, n_r, c = features.shape
    rho, phi = polar_cell_centers(n_az, n_r, pc_range)
    x = rho * jnp.cos(phi)
    y = rho * jnp.sin(phi)
    ones = jnp.ones_like(x)
    pts = jnp.stack([x, y, ones], axis=-1)  # (az, r, 3)

    def one(feat, tm):
        prev = jnp.einsum("ij,arj->ari", tm, pts)[..., :2]
        pr = jnp.hypot(prev[..., 0], prev[..., 1])
        pp = jnp.arctan2(prev[..., 1], prev[..., 0])
        # fractional grid coords (cell-center convention)
        gr = (pr - pc_range[0]) / (pc_range[3] - pc_range[0]) * n_r - 0.5
        span = pc_range[4] - pc_range[1]
        gp = (pp - pc_range[1]) / span * n_az - 0.5
        if cyclic:
            gp = jnp.mod(gp, n_az)
            # pad one wrap row so bilinear across the seam is exact
            f = jnp.concatenate([feat, feat[:1]], axis=0)
        else:
            f = feat
        coords = jnp.stack([
            jnp.broadcast_to(gp[..., None], gp.shape + (c,)),
            jnp.broadcast_to(gr[..., None], gr.shape + (c,)),
            jnp.broadcast_to(jnp.arange(c), gp.shape + (c,)).astype(
                jnp.float32),
        ])
        out = jax.scipy.ndimage.map_coordinates(
            f, coords, order=1, mode="constant", cval=0.0)
        valid = (pr >= pc_range[0]) & (pr <= pc_range[3])
        return out * valid[..., None]

    return jax.vmap(one)(features, transform)


def make_bev_transform(dx, dy, dtheta):
    """(B,) ego-motion deltas -> (B, 3, 3) current->previous transforms.

    The ego moved by translation (dx, dy) and yaw dtheta (expressed in the
    previous frame). A world point with current-frame coords p appears in
    the previous frame at R(+dtheta) p + t.
    """
    c, s = jnp.cos(dtheta), jnp.sin(dtheta)
    zeros = jnp.zeros_like(dx)
    ones = jnp.ones_like(dx)
    rows = [
        jnp.stack([c, -s, dx], -1),
        jnp.stack([s, c, dy], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ]
    return jnp.stack(rows, axis=-2)

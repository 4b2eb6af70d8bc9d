"""Device-side (jax.numpy) geometry: transforms, corners, rotations.

jnp twin of :mod:`partner_tpu.core.box_np_ops` for use inside jitted compute
(decode, losses, IoU/NMS, votemap-style target math on device).

Conventions: boxes ``[x, y, z, dx, dy, dz, (vx, vy,) yaw]``, yaw CCW about +z.
Replaces the torch box ops of the reference
(/root/reference/det3d/core/bbox/box_torch_ops.py and
/root/reference/det3d/models/e2e_utils/box_coder_utils.py:10-60).
"""

import jax.numpy as jnp
import numpy as np

# 2D corner template, clockwise from (-0.5, -0.5); same layout as the numpy
# twin (box_np_ops.corners_nd) so corner indices agree across host/device.
_CORNERS2D = np.array(
    [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=np.float32
)

_CORNERS3D = np.array(
    [
        [-0.5, -0.5, -0.5],
        [-0.5, -0.5, 0.5],
        [-0.5, 0.5, -0.5],
        [-0.5, 0.5, 0.5],
        [0.5, -0.5, -0.5],
        [0.5, -0.5, 0.5],
        [0.5, 0.5, -0.5],
        [0.5, 0.5, 0.5],
    ],
    dtype=np.float32,
)[[0, 2, 6, 4, 1, 3, 7, 5]]  # bottom ring CW, then top ring CW


def limit_period(val, offset=0.5, period=2 * np.pi):
    return val - jnp.floor(val / period + offset) * period


def wrap_angle_pi(angle):
    """Wrap to (-pi, pi] by a single +/- 2*pi correction.

    Mirrors the rectify wrap used throughout the reference head/coder
    (e2e_swv_head.py:346-354, box_coder_utils.py:120-128), which assumes the
    input is within (-3*pi, 3*pi).
    """
    angle = jnp.where(angle > np.pi, angle - 2 * np.pi, angle)
    angle = jnp.where(angle < -np.pi, angle + 2 * np.pi, angle)
    return angle


def rotation_2d(points, angles):
    """Rotate (..., P, 2) points by (...,) angles, CCW positive."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    x, y = points[..., 0], points[..., 1]
    xn = x * c[..., None] - y * s[..., None]
    yn = x * s[..., None] + y * c[..., None]
    return jnp.stack([xn, yn], axis=-1)


def center_to_corner_box2d(centers, dims, angles=None):
    """BEV corners (..., 4, 2) of rotated rectangles."""
    corners = dims[..., None, :] * jnp.asarray(_CORNERS2D)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers[..., None, :]


def boxes_to_corners_3d(boxes):
    """(N, 8, 3) corners of (N, 7) boxes [x,y,z,dx,dy,dz,yaw]."""
    corners = boxes[:, None, 3:6] * jnp.asarray(_CORNERS3D)
    xy = rotation_2d(corners[..., :2], boxes[:, 6])
    corners = jnp.concatenate([xy, corners[..., 2:3]], axis=-1)
    return corners + boxes[:, None, :3]


def cart_to_polar(xy):
    """(..., 2) -> (rho, phi)."""
    rho = jnp.sqrt(xy[..., 0] ** 2 + xy[..., 1] ** 2)
    phi = jnp.arctan2(xy[..., 1], xy[..., 0])
    return rho, phi


def polar_to_cart(rho, phi):
    return rho * jnp.cos(phi), rho * jnp.sin(phi)


def transform_points(points, voxel_shape):
    """jnp twin of box_np_ops.transform_points (cart -> polar layout)."""
    rho, phi = cart_to_polar(points[:, :2])
    if voxel_shape == "cylinder":
        return jnp.concatenate(
            [rho[:, None], phi[:, None], points[:, 2:3], points[:, :2], points[:, 3:]],
            axis=1,
        )
    elif voxel_shape == "cuboid":
        return jnp.concatenate([points, rho[:, None], phi[:, None]], axis=1)
    raise ValueError(f"unknown voxel_shape {voxel_shape!r}")


def bev_cell_centers(
    grid_hw, voxel_size, pc_range, out_size_factor, voxel_shape, center_offset=0.5
):
    """Cartesian (x, y) and polar (rho, phi) positions of BEV feature cells.

    Returns an (H_r, W_az, 4) array [x, y, rho, phi] for ``cylinder`` grids
    (rho along axis 0). ``center_offset=0.5`` matches the attention/offset
    grids of the reference (detectors/voxelnet.py:10-26,
    e2e_swv_head.py:175-191); ``center_offset=0.0`` matches the cell-corner
    convention of heatmap targets and CenterHead.decode
    (pipelines/preprocess.py:305-308, center_head.py:368-378).
    """
    nr, naz = grid_hw
    r_idx = (
        (np.arange(nr, dtype=np.float32) + center_offset) * voxel_size[0] * out_size_factor
    )
    a_idx = (
        (np.arange(naz, dtype=np.float32) + center_offset) * voxel_size[1] * out_size_factor
    )
    if voxel_shape == "cylinder":
        rho = r_idx + pc_range[0]
        phi = a_idx + pc_range[1]
        rho_g, phi_g = np.meshgrid(rho, phi, indexing="ij")
        x = rho_g * np.cos(phi_g)
        y = rho_g * np.sin(phi_g)
        return np.stack([x, y, rho_g, phi_g], axis=-1)
    else:
        x = r_idx + pc_range[0]
        y = a_idx + pc_range[1]
        x_g, y_g = np.meshgrid(x, y, indexing="ij")
        rho_g = np.sqrt(x_g ** 2 + y_g ** 2)
        phi_g = np.arctan2(y_g, x_g)
        return np.stack([x_g, y_g, rho_g, phi_g], axis=-1)

"""CenterCoder: absolute-xy box encoding for the E2E set-prediction head.

jnp re-implementation of the reference coder
(/root/reference/det3d/models/e2e_utils/box_coder_utils.py:64-277), operating
on fixed-shape padded arrays instead of python lists of per-scene tensors.

Encoding of a gt box [x, y, z, dx, dy, dz, yaw]:
  [x, y, z, log dx, log dy, log dz, cos yaw, sin yaw]   (sincos mode)
with dims clamped to >= 1e-5 before the log, and optional ``rectify`` that
re-expresses yaw relative to the center azimuth atan2(y, x), wrapped to
(-pi, pi] (box_coder_utils.py:118-128).

Predictions live in the same space (the head predicts absolute x/y after the
offset-grid shift, log-dims, cos/sin), so ``get_delta`` is a per-dimension
difference with the gt yaw re-encoded on the fly (box_coder_utils.py:175-221).
"""

import jax.numpy as jnp
import numpy as np

from .geometry import wrap_angle_pi


class CenterCoder:
    def __init__(self, code_size=7, encode_angle_by_sincos=True,
                 period=2 * np.pi, rectify=False, **kwargs):
        self.base_code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        self.period = period
        self.rectify = rectify
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)

    @staticmethod
    def _prep(boxes):
        dims = jnp.clip(boxes[..., 3:6], min=1e-5)
        return jnp.concatenate([boxes[..., :3], dims, boxes[..., 6:]], axis=-1)

    def _rectified_yaw(self, x, y, yaw):
        if not self.rectify:
            return yaw
        return wrap_angle_pi(yaw - jnp.arctan2(y, x))

    def encode(self, gt_boxes):
        """(..., 7+) gt boxes -> (..., code_size) encodings."""
        g = self._prep(gt_boxes)
        x, y, z = g[..., 0], g[..., 1], g[..., 2]
        log_dims = jnp.log(g[..., 3:6])
        yaw = self._rectified_yaw(x, y, g[..., 6])
        extra = g[..., 7:]
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        else:
            ang = yaw[..., None]
        return jnp.concatenate(
            [jnp.stack([x, y, z], axis=-1), log_dims, ang, extra], axis=-1
        )

    def get_delta(self, gt_boxes, preds, **kwargs):
        """Element-wise regression residual gt_encoded - preds.

        gt_boxes are raw (..., 7+); preds are already in encoded space.
        In plain-angle mode the reference regresses yaw/period, not raw
        yaw (box_coder_utils.py:213, mirrored by decode's rt*period at
        :240 — the reference's encode() at :134 is the inconsistent one).
        """
        enc = self.encode(gt_boxes)
        if not self.encode_angle_by_sincos:
            enc = jnp.concatenate(
                [enc[..., :6], enc[..., 6:7] / self.period, enc[..., 7:]],
                axis=-1,
            )
        return enc - preds

    def decode(self, preds):
        """Encoded predictions -> raw boxes [x, y, z, dx, dy, dz, yaw, ...]."""
        xyz = preds[..., :3]
        # clamp: raw dim logits can spike early in training; e^8 = 3 km
        dims = jnp.exp(jnp.clip(preds[..., 3:6], -8.0, 8.0))
        if self.encode_angle_by_sincos:
            yaw = jnp.arctan2(preds[..., 7], preds[..., 6])
            extra = preds[..., 8:]
        else:
            yaw = preds[..., 6] * self.period
            extra = preds[..., 7:]
        if self.rectify:
            raise NotImplementedError("rectified decode handled in head decode")
        return jnp.concatenate([xyz, dims, yaw[..., None], extra], axis=-1)

    # alias kept for parity with the reference API name
    decode_torch = decode


class CenterCoderV2(CenterCoder):
    """Grid-relative variant of the coder
    (/root/reference/det3d/models/e2e_utils/box_coder_utils.py:280-497).

    Same absolute-xyz / log-dim / sincos encoding as CenterCoder, but
    ``get_delta`` treats the predicted yaw as RELATIVE to the emitting grid
    cell's azimuth when ``rectify`` is on: the prediction's (cos, sin) is
    rotated into the global frame by the cell angle atan2(y_grid, x_grid)
    before differencing against the gt yaw (box_coder_utils.py:389-437).
    Also provides ``encode_with_rois`` — the diagonal-normalized RoI-relative
    encoding used by second-stage refinement (box_coder_utils.py:466-497).
    """

    def get_delta(self, gt_boxes, preds, x_grid=None, y_grid=None, **kwargs):
        if not self.encode_angle_by_sincos:
            raise NotImplementedError(
                "CenterCoderV2.get_delta requires sincos mode "
                "(box_coder_utils.py:434 raises likewise)")
        g = self._prep(gt_boxes)
        xyz_t = g[..., :3] - preds[..., :3]
        dims_t = jnp.log(g[..., 3:6]) - preds[..., 3:6]
        cosp, sinp = preds[..., 6], preds[..., 7]
        if self.rectify:
            assert x_grid is not None and y_grid is not None
            theta = jnp.arctan2(sinp, cosp) + jnp.arctan2(y_grid, x_grid)
            theta = wrap_angle_pi(theta)
            cosp, sinp = jnp.cos(theta), jnp.sin(theta)
        rg = g[..., 6]
        ang_t = jnp.stack([jnp.cos(rg) - cosp, jnp.sin(rg) - sinp], axis=-1)
        extra_t = g[..., 7:] - preds[..., 8:]
        return jnp.concatenate([xyz_t, dims_t, ang_t, extra_t], axis=-1)

    def encode_with_rois(self, boxes, rois):
        """RoI-relative encoding: centers normalized by the RoI BEV diagonal,
        z by RoI height, dims as log ratios, yaw by difference/sincos."""
        b = self._prep(boxes)
        r = self._prep(rois)
        diag = jnp.sqrt(r[..., 3] ** 2 + r[..., 4] ** 2)
        xt = (b[..., 0] - r[..., 0]) / diag
        yt = (b[..., 1] - r[..., 1]) / diag
        zt = (b[..., 2] - r[..., 2]) / r[..., 5]
        dims_t = jnp.log(b[..., 3:6] / r[..., 3:6])
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(b[..., 6]) - jnp.cos(r[..., 6]),
                             jnp.sin(b[..., 6]) - jnp.sin(r[..., 6])], axis=-1)
        else:
            ang = (b[..., 6] - r[..., 6])[..., None]
        extra = b[..., 7:] - r[..., 7:]
        return jnp.concatenate(
            [jnp.stack([xt, yt, zt], axis=-1), dims_t, ang, extra], axis=-1
        )


class CenterCoderPolar(CenterCoder):
    """Polar-space box encoding
    (/root/reference/det3d/models/e2e_utils/box_coder_utils.py:498-720).

    A gt box [x, y, z, dx, dy, dz, yaw] encodes as
      [rho, phi, z, log(radius), log(dz), ratio, cos rel_yaw, sin rel_yaw]
    with rho/phi the polar center, radius = sqrt(dx^2+dy^2)/2 (half the BEV
    diagonal), ratio = dy/dx the aspect, and (under ``rectify``) the yaw
    re-expressed relative to the center azimuth phi wrapped to (-pi, pi].
    ``decode`` inverts radius/ratio back to (dx, dy).
    """

    def encode(self, gt_boxes):
        g = self._prep(gt_boxes)
        x, y, z = g[..., 0], g[..., 1], g[..., 2]
        dx, dy, dz = g[..., 3], g[..., 4], g[..., 5]
        rho = jnp.sqrt(x ** 2 + y ** 2)
        phi = jnp.arctan2(y, x)
        radius = jnp.sqrt(dx ** 2 + dy ** 2) * 0.5
        ratio = dy / dx
        yaw = g[..., 6]
        if self.rectify:
            yaw = wrap_angle_pi(yaw - phi)
        extra = g[..., 7:]
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        else:
            ang = yaw[..., None]
        return jnp.concatenate(
            [jnp.stack([rho, phi, z, jnp.log(radius), jnp.log(dz), ratio],
                       axis=-1), ang, extra], axis=-1)

    def decode(self, preds):
        rho, phi, z = preds[..., 0], preds[..., 1], preds[..., 2]
        radius = jnp.exp(jnp.clip(preds[..., 3], -8.0, 8.0))
        dz = jnp.exp(jnp.clip(preds[..., 4], -8.0, 8.0))
        ratio = preds[..., 5]
        dx = 2.0 * radius / jnp.sqrt(1.0 + ratio ** 2)
        dy = ratio * dx
        if self.encode_angle_by_sincos:
            yaw = jnp.arctan2(preds[..., 7], preds[..., 6])
            extra = preds[..., 8:]
        else:
            yaw = preds[..., 6] * self.period
            extra = preds[..., 7:]
        if self.rectify:
            yaw = wrap_angle_pi(yaw + phi)
        x = rho * jnp.cos(phi)
        y = rho * jnp.sin(phi)
        return jnp.concatenate(
            [jnp.stack([x, y, z, dx, dy, dz, yaw], axis=-1), extra], axis=-1)

    decode_torch = decode


class CenterCoderTP(CenterCoder):
    """Template-box dim encoding
    (/root/reference/det3d/models/e2e_utils/box_coder_utils.py:1189-1399):
    dims encode as offsets from a fixed per-class template box [tx, ty, tz]
    instead of logs; everything else matches CenterCoder. The remaining
    reference variants (CenterCoderPolarSIG :957, CenterCoderMTTP :1402)
    are unreachable dead code in the release and combine these same two
    axes (polar centers x template dims) with sigmoid/multi-template dims.
    """

    def __init__(self, templates_box=(4.0, 2.0, 1.6), **kwargs):
        super().__init__(**kwargs)
        self.templates_box = jnp.asarray(templates_box, jnp.float32)

    def encode(self, gt_boxes):
        g = self._prep(gt_boxes)
        x, y, z = g[..., 0], g[..., 1], g[..., 2]
        dims = g[..., 3:6] - self.templates_box
        yaw = self._rectified_yaw(x, y, g[..., 6])
        extra = g[..., 7:]
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        else:
            ang = yaw[..., None]
        return jnp.concatenate(
            [jnp.stack([x, y, z], axis=-1), dims, ang, extra], axis=-1)

    def decode(self, preds):
        xyz = preds[..., :3]
        dims = jnp.clip(preds[..., 3:6] + self.templates_box, min=1e-5)
        if self.encode_angle_by_sincos:
            yaw = jnp.arctan2(preds[..., 7], preds[..., 6])
            extra = preds[..., 8:]
        else:
            yaw = preds[..., 6] * self.period
            extra = preds[..., 7:]
        if self.rectify:
            raise NotImplementedError("rectified decode handled in head decode")
        return jnp.concatenate([xyz, dims, yaw[..., None], extra], axis=-1)

    decode_torch = decode


class CenterCoderPolarTP(CenterCoderPolar):
    """Polar centers + template dims (box_coder_utils.py:726-954): rho/phi/z
    centers like CenterCoderPolar, but (dx, dy, dz) encode as offsets from
    the template box rather than radius/ratio logs."""

    def __init__(self, templates_box=(4.0, 2.0, 1.6), **kwargs):
        super().__init__(**kwargs)
        self.templates_box = jnp.asarray(templates_box, jnp.float32)

    def encode(self, gt_boxes):
        g = self._prep(gt_boxes)
        x, y, z = g[..., 0], g[..., 1], g[..., 2]
        rho = jnp.sqrt(x ** 2 + y ** 2)
        phi = jnp.arctan2(y, x)
        dims = g[..., 3:6] - self.templates_box
        yaw = g[..., 6]
        if self.rectify:
            yaw = wrap_angle_pi(yaw - phi)
        extra = g[..., 7:]
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        else:
            ang = yaw[..., None]
        return jnp.concatenate(
            [jnp.stack([rho, phi, z], axis=-1), dims, ang, extra], axis=-1)

    def decode(self, preds):
        rho, phi, z = preds[..., 0], preds[..., 1], preds[..., 2]
        dims = jnp.clip(preds[..., 3:6] + self.templates_box, min=1e-5)
        if self.encode_angle_by_sincos:
            yaw = jnp.arctan2(preds[..., 7], preds[..., 6])
            extra = preds[..., 8:]
        else:
            yaw = preds[..., 6] * self.period
            extra = preds[..., 7:]
        if self.rectify:
            yaw = wrap_angle_pi(yaw + phi)
        x = rho * jnp.cos(phi)
        y = rho * jnp.sin(phi)
        return jnp.concatenate(
            [jnp.stack([x, y, z], axis=-1), dims, yaw[..., None], extra],
            axis=-1)

    decode_torch = decode

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
        """
        return self.encode(gt_boxes) - preds

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

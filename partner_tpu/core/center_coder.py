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

import jax
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
        """Encoded predictions -> raw boxes [x, y, z, dx, dy, dz, yaw, ...].

        True inverse of ``encode`` including ``rectify``: x/y are absolute
        in this encoding, so the center azimuth subtracted by
        ``_rectified_yaw`` is recoverable as atan2(y, x). Deviation: the
        reference coder raises here (box_coder_utils.py:234-235) and
        defers the azimuth add to the head decode
        (e2e_swv_head.py:344-354) — same math, done in one place so every
        caller (SetCriterion IoU losses, E2EDetector.predict) decodes to
        the GLOBAL frame regardless of coder config (ADVICE r4)."""
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
            yaw = wrap_angle_pi(
                yaw + jnp.arctan2(preds[..., 1], preds[..., 0]))
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

    def decode(self, preds):
        if self.rectify:
            # V2's rectify is GRID-relative (yaw vs the emitting cell's
            # azimuth, get_delta above) — the inverse needs the cell
            # coordinates, which a bare encoding row doesn't carry.
            raise NotImplementedError(
                "CenterCoderV2 rectified decode needs the grid cell; "
                "decode at the head where x_grid/y_grid are in scope")
        return CenterCoder.decode(self, preds)

    decode_torch = decode

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

    def get_delta(self, gt_boxes, preds, **kwargs):
        """encode(gt) - preds, sincos mode only
        (box_coder_utils.py:658-660 raises NotImplementedError likewise)."""
        if not self.encode_angle_by_sincos:
            raise NotImplementedError(
                "polar coders regress yaw as (cos, sin) only")
        return self.encode(gt_boxes) - preds

    def decode(self, preds):
        """True inverse of ``encode``. Deviation: the reference's polar
        decode_torch (box_coder_utils.py:668-691, marked "no use in this
        proj") is dead code that reads the CARTESIAN layout and never
        inverts rho/phi/radius/ratio; this one round-trips encode."""
        rho, phi, z = preds[..., 0], preds[..., 1], preds[..., 2]
        radius = jnp.exp(jnp.clip(preds[..., 3], -8.0, 8.0))
        dz = jnp.exp(jnp.clip(preds[..., 4], -8.0, 8.0))
        ratio = self._decode_ratio(preds[..., 5])
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

    @staticmethod
    def _decode_ratio(ratio_col):
        """Predicted ratio column -> raw aspect dy/dx (identity here;
        PolarTP/PolarSIG re-express the column)."""
        return ratio_col

    decode_torch = decode


class CenterCoderPolarTP(CenterCoderPolar):
    """Polar encoding with a template aspect ratio
    (box_coder_utils.py:726-954): identical to CenterCoderPolar except the
    ratio column regresses the RESIDUAL dy/dx - template_ratio, so the
    network predicts around the class-typical aspect instead of its
    absolute value (encode :787, get_delta :890)."""

    def __init__(self, template_ratio=None, **kwargs):
        super().__init__(**kwargs)
        assert template_ratio is not None, "ratio = dy / dx"
        self.template_ratio = float(template_ratio)

    def encode(self, gt_boxes):
        enc = jnp.asarray(super().encode(gt_boxes))
        return enc.at[..., 5].add(-self.template_ratio)

    def _decode_ratio(self, ratio_col):
        return ratio_col + self.template_ratio


class CenterCoderPolarSIG(CenterCoderPolar):
    """Polar encoding with a sigmoid-squashed aspect ratio
    (box_coder_utils.py:957-1186): the ratio column stores
    logit(1 / (dy/dx)) — dy >= dx in the det3d convention, so 1/ratio lives
    in (0, 1] and the logit makes it an unconstrained logit target
    (encode :1017). ``get_delta`` regresses the RAW ratio against the
    decoded prediction 1/sigmoid(ratiop) (get_delta :1097-1098), so the
    target is in ratio units while the prediction is in logit units."""

    def encode(self, gt_boxes):
        enc = jnp.asarray(super().encode(gt_boxes))
        ratio = enc[..., 5]
        # guarded deviation: the reference's torch.logit(1/ratio) (:1017,
        # no eps) is +inf for square boxes (dy == dx); clamp keeps the
        # target finite there while matching everywhere dy > dx.
        inv = jnp.clip(1.0 / ratio, max=1.0 - 1e-6)
        return enc.at[..., 5].set(jnp.log(inv) - jnp.log1p(-inv))

    def get_delta(self, gt_boxes, preds, **kwargs):
        if not self.encode_angle_by_sincos:
            raise NotImplementedError(
                "polar coders regress yaw as (cos, sin) only")
        # polar targets with the ratio column in raw dy/dx units
        enc = jnp.asarray(CenterCoderPolar.encode(self, gt_boxes))
        preds = jnp.asarray(preds)
        delta = enc - preds
        ratiog = enc[..., 5]
        ratiop = 1.0 / jax.nn.sigmoid(preds[..., 5])
        return delta.at[..., 5].set(ratiog - ratiop)

    def _decode_ratio(self, ratio_col):
        return 1.0 / jax.nn.sigmoid(ratio_col)


class CenterCoderTP(CenterCoder):
    """Template-box dim encoding
    (/root/reference/det3d/models/e2e_utils/box_coder_utils.py:1189-1399):
    dims encode as LINEAR offsets dg - template from a fixed template box
    [tx, ty, tz] instead of logs; everything else matches CenterCoder. The
    reference passes the template per call (encode :1232,
    get_delta :1297) — a config-level ``templates_box`` default is also
    accepted here so the coder drops into the SetCriterion contract.
    """

    def __init__(self, templates_box=None, **kwargs):
        super().__init__(**kwargs)
        self.templates_box = (
            None if templates_box is None
            else jnp.asarray(templates_box, jnp.float32))

    def _template(self, template_box):
        t = self.templates_box if template_box is None else template_box
        assert t is not None, "CenterCoderTP needs a template box [tx,ty,tz]"
        return jnp.asarray(t, jnp.float32)

    def encode(self, gt_boxes, templates_box=None):
        g = self._prep(gt_boxes)
        x, y, z = g[..., 0], g[..., 1], g[..., 2]
        dims = g[..., 3:6] - self._template(templates_box)
        yaw = self._rectified_yaw(x, y, g[..., 6])
        extra = g[..., 7:]
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        else:
            ang = yaw[..., None]
        return jnp.concatenate(
            [jnp.stack([x, y, z], axis=-1), dims, ang, extra], axis=-1)

    def get_delta(self, gt_boxes, preds, template_box=None, **kwargs):
        """encode(gt, template) - preds, with plain-angle yaw regressed as
        yaw/period (box_coder_utils.py:1297-1342)."""
        enc = self.encode(gt_boxes, self._template(template_box))
        if not self.encode_angle_by_sincos:
            enc = jnp.concatenate(
                [enc[..., :6], enc[..., 6:7] / self.period, enc[..., 7:]],
                axis=-1)
        return enc - preds

    def decode(self, preds, template_box=None):
        """Inverse without a dim clamp, matching the reference decode
        (:1344-1366) exactly; loss/NMS consumers clamp downstream. Like
        CenterCoder.decode, the rectified inverse adds back atan2(y, x)
        (the reference raises and defers to the head decode)."""
        xyz = preds[..., :3]
        dims = preds[..., 3:6] + self._template(template_box)
        if self.encode_angle_by_sincos:
            yaw = jnp.arctan2(preds[..., 7], preds[..., 6])
            extra = preds[..., 8:]
        else:
            yaw = preds[..., 6] * self.period
            extra = preds[..., 7:]
        if self.rectify:
            yaw = wrap_angle_pi(
                yaw + jnp.arctan2(preds[..., 1], preds[..., 0]))
        return jnp.concatenate([xyz, dims, yaw[..., None], extra], axis=-1)

    decode_torch = decode


class CenterCoderMTTP(CenterCoder):
    """Multi-task template (anchor) dim encoding
    (box_coder_utils.py:1402-1599): each task carries its own anchor size
    tmp_box[task_id] = [dx, dy, dz] and dims encode as log(dg / anchor) —
    the classic anchor-relative log encoding — decoded by exp(dt) * anchor
    (:1556-1558). There is no rectify branch in this variant (:1445-1468
    has none)."""

    def __init__(self, tmp_box=None, **kwargs):
        kwargs.pop("rectify", None)
        super().__init__(rectify=False, **kwargs)
        assert tmp_box is not None, "per-task anchor sizes required"
        self.tmp_box = jnp.asarray(tmp_box, jnp.float32)  # (num_tasks, 3)

    def encode(self, gt_boxes, task_id=0):
        g = self._prep(gt_boxes)
        anchor = self.tmp_box[task_id]
        dims = jnp.log(g[..., 3:6] / anchor)
        yaw = g[..., 6]
        extra = g[..., 7:]
        if self.encode_angle_by_sincos:
            ang = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        else:
            ang = yaw[..., None]
        return jnp.concatenate(
            [g[..., :3], dims, ang, extra], axis=-1)

    def get_delta(self, gt_boxes, preds, task_id=0, **kwargs):
        enc = self.encode(gt_boxes, task_id)
        if not self.encode_angle_by_sincos:
            enc = jnp.concatenate(
                [enc[..., :6], enc[..., 6:7] / self.period, enc[..., 7:]],
                axis=-1)
        return enc - preds

    def decode(self, preds, task_id=0):
        xyz = preds[..., :3]
        anchor = self.tmp_box[task_id]
        dims = jnp.exp(jnp.clip(preds[..., 3:6], -8.0, 8.0)) * anchor
        if self.encode_angle_by_sincos:
            yaw = jnp.arctan2(preds[..., 7], preds[..., 6])
            extra = preds[..., 8:]
        else:
            yaw = preds[..., 6] * self.period
            extra = preds[..., 7:]
        return jnp.concatenate([xyz, dims, yaw[..., None], extra], axis=-1)

    decode_torch = decode


#: Registry of coder types selectable from CODER_CONFIG["type"]; the
#: reference hardwires CenterCoder in the head (e2e_swv_head.py:121) and
#: leaves the variants unreachable — here every variant is config-reachable.
CODERS = {
    "CenterCoder": CenterCoder,
    "CenterCoderV2": CenterCoderV2,
    "CenterCoderPolar": CenterCoderPolar,
    "CenterCoderPolarTP": CenterCoderPolarTP,
    "CenterCoderPolarSIG": CenterCoderPolarSIG,
    "CenterCoderTP": CenterCoderTP,
    "CenterCoderMTTP": CenterCoderMTTP,
}


def build_coder(coder_cfg, period=2 * np.pi):
    """Build a box coder from a CODER_CONFIG dict (type + ctor kwargs)."""
    cfg = dict(coder_cfg)
    cls = CODERS[cfg.pop("type", "CenterCoder")]
    cfg.setdefault("period", period)
    return cls(**cfg)

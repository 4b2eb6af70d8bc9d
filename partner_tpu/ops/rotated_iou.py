"""Rotated BEV IoU and 3D IoU in pure JAX (vectorized, fixed shapes).

Replaces the reference CUDA polygon-clipping kernels
(/root/reference/det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:13-200,
iou3d_nms_utils.py:15-75) with the same candidate-vertex algorithm, fully
vectorized for the VPU:

  intersection polygon vertices of two convex quads =
    {corners of A inside B} + {corners of B inside A} +
    {edge-edge intersection points}          (<= 24 candidates)
  -> sort candidates by angle around their mean -> shoelace area.

Boxes are BEV rectangles [x, y, dx, dy, yaw] (yaw CCW). 3D IoU adds the z
interval overlap with boxes [x, y, z, dx, dy, dz, yaw] (z = center).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import center_to_corner_box2d

_EPS = 1e-8


def _box_corners(boxes):
    """(..., 5) -> (..., 4, 2) corners."""
    return center_to_corner_box2d(boxes[..., :2], boxes[..., 2:4], boxes[..., 4])


def _points_in_rect(points, box):
    """points (..., P, 2) inside rect box (..., 5) -> bool (..., P)."""
    shift = points - box[..., None, :2]
    c, s = jnp.cos(box[..., 4]), jnp.sin(box[..., 4])
    lx = shift[..., 0] * c[..., None] + shift[..., 1] * s[..., None]
    ly = -shift[..., 0] * s[..., None] + shift[..., 1] * c[..., None]
    # small eps so shared edges count as inside (matches CUDA kernel tolerance)
    return (jnp.abs(lx) <= box[..., None, 2] * 0.5 + 1e-5) & (
        jnp.abs(ly) <= box[..., None, 3] * 0.5 + 1e-5
    )


def _segment_intersections(ca, cb):
    """All 16 edge-pair intersection points of two quads.

    ca, cb: (..., 4, 2) corners. Returns points (..., 16, 2), valid (..., 16).
    """
    a0 = ca
    a1 = jnp.roll(ca, -1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)

    # broadcast to (..., 4, 4, 2): a edges x b edges
    p = a0[..., :, None, :]
    r = (a1 - a0)[..., :, None, :]
    q = b0[..., None, :, :]
    s = (b1 - b0)[..., None, :, :]

    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q - p
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]

    denom = jnp.where(jnp.abs(rxs) < _EPS, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom
    valid = (
        (jnp.abs(rxs) >= _EPS)
        & (t >= -1e-6) & (t <= 1 + 1e-6)
        & (u >= -1e-6) & (u <= 1 + 1e-6)
    )
    pt = p + t[..., None] * r
    flat = lambda x: x.reshape(x.shape[:-3] + (16,) + x.shape[-1:])
    return flat(pt), valid.reshape(valid.shape[:-2] + (16,))


def rect_intersection_area(box_a, box_b):
    """Intersection area of two rotated rects (broadcastable leading dims).

    box_a, box_b: (..., 5).
    """
    ca = _box_corners(box_a)
    cb = _box_corners(box_b)

    in_b = _points_in_rect(ca, box_b)  # (..., 4)
    in_a = _points_in_rect(cb, box_a)
    inter_pts, inter_valid = _segment_intersections(ca, cb)

    pts = jnp.concatenate([ca, cb, inter_pts], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([in_b, in_a, inter_valid], axis=-1)  # (..., 24)

    n = jnp.sum(valid, axis=-1)
    center = jnp.sum(
        jnp.where(valid[..., None], pts, 0.0), axis=-2
    ) / jnp.maximum(n, 1)[..., None]

    rel = pts - center[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid sorted last
    order = jnp.argsort(ang, axis=-1)
    rel_sorted = jnp.take_along_axis(rel, order[..., None], axis=-2)

    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 < n[..., None], idx + 1, 0)
    p0 = rel_sorted
    p1 = jnp.take_along_axis(rel_sorted, nxt[..., None], axis=-2)
    cross = p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0]
    cross = jnp.where(idx < n[..., None], cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(n >= 3, area, 0.0)


def _fill_next_defined(vals, defined):
    """Replace undefined slots with the next defined vertex (cyclic).

    vals (..., M, 2), defined (..., M). log2(M) jump passes.
    """
    m = vals.shape[-2]
    shift = 1
    while shift < m:
        nv = jnp.roll(vals, -shift, axis=-2)
        nd = jnp.roll(defined, -shift, axis=-1)
        vals = jnp.where(defined[..., None], vals, nv)
        defined = defined | nd
        shift *= 2
    return vals


def _clip_halfplane(poly, axis, sign, bound):
    """One Sutherland-Hodgman clip: keep sign*poly[axis] <= bound.

    poly (..., M, 2) vertices in order (duplicates allowed). Returns
    (..., 2M, 2) vertices and a nonempty flag (...,).
    """
    bound = jnp.asarray(bound)[..., None]  # (..., 1) against (..., M)
    val = poly[..., axis] * sign
    inside = val <= bound
    nxt = jnp.roll(poly, -1, axis=-2)
    val_n = jnp.roll(val, -1, axis=-1)
    inside_n = val_n <= bound
    cross = inside != inside_n
    den = val_n - val
    t = (bound - val) / jnp.where(jnp.abs(den) < _EPS, 1.0, den)
    t = jnp.clip(t, 0.0, 1.0)
    inter = poly + t[..., None] * (nxt - poly)

    out = jnp.stack([poly, inter], axis=-2)  # (..., M, 2slots, 2)
    out = out.reshape(poly.shape[:-2] + (2 * poly.shape[-2], 2))
    defined = jnp.stack([inside, cross], axis=-1)
    defined = defined.reshape(inside.shape[:-1] + (2 * inside.shape[-1],))
    nonempty = jnp.any(defined, axis=-1)
    return _fill_next_defined(out, defined), nonempty


def rect_intersection_area_sh(box_a, box_b):
    """Sort-free exact rotated-rect intersection (Sutherland-Hodgman).

    Clips A's corners in B's local (axis-aligned) frame by B's four
    half-planes; dropped slots are replaced by adjacent vertices
    (zero-length edges contribute nothing to the shoelace sum), so no
    per-pair sort or arctan2 is needed — ~10x cheaper on the VPU than the
    candidate-vertex kernel. Broadcastable leading dims; boxes (..., 5).
    """
    ca = _box_corners(box_a)  # world (..., 4, 2)
    rel = ca - box_b[..., None, :2]
    c, s = jnp.cos(box_b[..., 4]), jnp.sin(box_b[..., 4])
    lx = rel[..., 0] * c[..., None] + rel[..., 1] * s[..., None]
    ly = -rel[..., 0] * s[..., None] + rel[..., 1] * c[..., None]
    poly = jnp.stack([lx, ly], axis=-1)

    hx = box_b[..., 2] * 0.5
    hy = box_b[..., 3] * 0.5
    ok = jnp.ones(box_b.shape[:-1], dtype=bool)
    for axis, sign, bound in (
        (0, 1.0, hx), (0, -1.0, hx), (1, 1.0, hy), (1, -1.0, hy)
    ):
        poly, nonempty = _clip_halfplane(poly, axis, sign, bound)
        ok = ok & nonempty

    nxt = jnp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - poly[..., 1] * nxt[..., 0]
    area = 0.5 * jnp.abs(cross.sum(axis=-1))
    return jnp.where(ok, area, 0.0)


# CCW unit-square corners. Plain numpy on purpose: a module-level
# jnp.asarray dispatches to the default device at IMPORT time, which
# initializes the backend — and hangs every `import partner_tpu` (CLIs,
# loaders) when the remote-TPU tunnel is down. jnp ops consume the numpy
# constant with identical semantics (traced as a literal).
_CORNER_TMPL = np.asarray(
    [[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]], np.float32
)


def _clip_aa(p0, p1, h, eps_par=1e-5, eps_c=1e-4):
    """Liang-Barsky clip of segments p0->p1 to the AA rect [-h, h].

    p0, p1: (..., E, 2); h: (..., 2) half extents. Returns clip params
    (t0, t1) in [0, 1] and a per-edge weight: 1 interior, 0.5 for pieces
    coincident with the rect boundary (within eps_c), 0 outside.
    Half-weighting coincident pieces makes the Green decomposition exact
    for degenerate overlaps (identical boxes, shared edges), where both
    polygons contribute the same segment with equal/opposite orientation.
    """
    a = p0
    d = p1 - p0
    hi = jnp.broadcast_to(h[..., None, :], a.shape)
    lo = -hi

    # a parallel edge poses no constraint on its axis when inside the slab
    # and kills the segment when outside
    parallel = jnp.abs(d) < eps_par
    dd = jnp.where(parallel, 1.0, d)
    t_lo = (lo - a) / dd
    t_hi = (hi - a) / dd
    t_in = jnp.minimum(t_lo, t_hi)
    t_out = jnp.maximum(t_lo, t_hi)
    outside = (a < lo - eps_c) | (a > hi + eps_c)
    on_bound = parallel & ~outside & (
        (jnp.abs(a - lo) <= eps_c) | (jnp.abs(a - hi) <= eps_c)
    )
    big = jnp.float32(1e9)
    t_in = jnp.where(parallel, jnp.where(outside, big, -big), t_in)
    t_out = jnp.where(parallel, jnp.where(outside, -big, big), t_out)
    t0 = jnp.clip(jnp.max(t_in, axis=-1), 0.0, 1.0)
    t1 = jnp.clip(jnp.min(t_out, axis=-1), 0.0, 1.0)
    valid = t0 < t1

    weight = jnp.where(valid, 1.0, 0.0) * jnp.where(
        jnp.any(on_bound, axis=-1), 0.5, 1.0)
    return t0, t1, weight


def rect_intersection_area_green(box_a, box_b):
    """Exact rotated-rect intersection area via Green's theorem.

    Area(A ∩ B) = ½ ∮ (x dy − y dx) over ∂(A∩B), which decomposes into the
    edges of A clipped inside B plus the edges of B clipped inside A; each
    straight piece P→Q contributes cross(P, Q) regardless of connectivity.
    No polygon buffers, no sorting, no compaction — fixed ~300 flops/pair,
    ~16x less memory traffic than the Sutherland-Hodgman slot-doubling
    kernel, which is what the O(N2) NMS sweep needs. Boundary-coincident
    pieces (identical boxes, shared edges) are half-weighted from each side.
    """
    # everything is computed in B's local frame; the rotation between the
    # boxes comes from the ANGLE DIFFERENCE so identical boxes map to
    # exactly coincident axis-aligned rects (no trig round-trip noise)
    dth = box_a[..., 4] - box_b[..., 4]
    c, s = jnp.cos(dth), jnp.sin(dth)
    cb_, sb_ = jnp.cos(box_b[..., 4]), jnp.sin(box_b[..., 4])
    return _green_body(box_a, box_b, c, s, cb_, sb_)


def rect_intersection_area_green_pretrig(box_a, box_b, trig_a, trig_b):
    """:func:`rect_intersection_area_green` with the per-box yaw trig
    precomputed (trig_* = (..., 2) [cos yaw, sin yaw]).

    In an O(N^2) NMS sweep this removes every transcendental from the pair
    kernel: the angle-difference rotation comes from the identities
    cos(a-b) = ca*cb + sa*sb, sin(a-b) = sa*cb - ca*sb on broadcast per-box
    values. For a == b the sine is exactly 0 in floating point (x*y - y*x),
    so the identical-box degenerate case stays exact."""
    ca, sa = trig_a[..., 0], trig_a[..., 1]
    cb_, sb_ = trig_b[..., 0], trig_b[..., 1]
    c = ca * cb_ + sa * sb_
    s = sa * cb_ - ca * sb_
    return _green_body(box_a, box_b, c, s, cb_, sb_)


def _green_body(box_a, box_b, c, s, cb_, sb_):
    dxy = box_a[..., :2] - box_b[..., :2]
    t_ab = jnp.stack(
        [dxy[..., 0] * cb_ + dxy[..., 1] * sb_,
         -dxy[..., 0] * sb_ + dxy[..., 1] * cb_], axis=-1)

    ha = box_a[..., 2:4] * 0.5
    hb = box_b[..., 2:4] * 0.5
    ca_loc = _CORNER_TMPL * ha[..., None, :]          # A corners, A frame
    cb_loc = _CORNER_TMPL * hb[..., None, :]          # B corners, B frame

    def rot(p, c, s):
        return jnp.stack(
            [p[..., 0] * c[..., None] - p[..., 1] * s[..., None],
             p[..., 0] * s[..., None] + p[..., 1] * c[..., None]], axis=-1)

    ca_in_b = rot(ca_loc, c, s) + t_ab[..., None, :]  # A corners, B frame
    # B corners in A frame: inverse transform
    t_ba = rot((-t_ab)[..., None, :], c, -s)[..., 0, :]
    cb_in_a = rot(cb_loc, c, -s) + t_ba[..., None, :]

    # clip A's edges against B (in B frame), B's edges against A (in A
    # frame); contributions are all evaluated in the COMMON B frame — the
    # Green integral over open pieces is frame-dependent, only the total
    # over the closed boundary is invariant
    a0, a1 = ca_in_b, jnp.roll(ca_in_b, -1, axis=-2)
    ta0, ta1, wa = _clip_aa(a0, a1, hb)
    b0a, b1a = cb_in_a, jnp.roll(cb_in_a, -1, axis=-2)
    tb0, tb1, wb = _clip_aa(b0a, b1a, ha)
    b0, b1 = cb_loc, jnp.roll(cb_loc, -1, axis=-2)    # B edges, B frame

    def contrib(p0, p1, t0, t1, w):
        q0 = p0 + t0[..., None] * (p1 - p0)
        q1 = p0 + t1[..., None] * (p1 - p0)
        cr = q0[..., 0] * q1[..., 1] - q0[..., 1] * q1[..., 0]
        return (w * cr).sum(axis=-1)

    area = 0.5 * jnp.abs(
        contrib(a0, a1, ta0, ta1, wa) + contrib(b0, b1, tb0, tb1, wb))
    return area


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise BEV IoU: (N, 5) x (M, 5) -> (N, M).

    Prefer :func:`iou_bev_row` in loops — this materializes N*M candidate
    buffers.
    """
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    inter = rect_intersection_area(
        jnp.broadcast_to(a, (boxes_a.shape[0], boxes_b.shape[0], 5)),
        jnp.broadcast_to(b, (boxes_a.shape[0], boxes_b.shape[0], 5)),
    )
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def iou_bev_row(box, boxes):
    """IoU of one (5,) box against (N, 5) boxes -> (N,)."""
    b = jnp.broadcast_to(box[None, :], boxes.shape)
    inter = rect_intersection_area(b, boxes)
    union = box[2] * box[3] + boxes[:, 2] * boxes[:, 3] - inter
    return inter / jnp.maximum(union, _EPS)


def _bev5(boxes7):
    return boxes7[..., jnp.array([0, 1, 3, 4, 6])]


def boxes_iou3d(boxes_a, boxes_b):
    """Elementwise 3D IoU of aligned (N, 7) box arrays -> (N,).

    Matches boxes_iou3d_gpu's diagonal use in the E2E IOULoss
    (loss_utils.py:585-594): z is the box center, height dz.
    """
    inter_bev = rect_intersection_area_sh(_bev5(boxes_a), _bev5(boxes_b))
    za1 = boxes_a[..., 2] - boxes_a[..., 5] * 0.5
    za2 = boxes_a[..., 2] + boxes_a[..., 5] * 0.5
    zb1 = boxes_b[..., 2] - boxes_b[..., 5] * 0.5
    zb2 = boxes_b[..., 2] + boxes_b[..., 5] * 0.5
    overlap_z = jnp.clip(jnp.minimum(za2, zb2) - jnp.maximum(za1, zb1), min=0.0)
    inter = inter_bev * overlap_z
    vol_a = boxes_a[..., 3] * boxes_a[..., 4] * boxes_a[..., 5]
    vol_b = boxes_b[..., 3] * boxes_b[..., 4] * boxes_b[..., 5]
    return inter / jnp.maximum(vol_a + vol_b - inter, _EPS)

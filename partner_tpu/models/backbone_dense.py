"""PolarDenseFHD — TPU-native dense middle extractor (flagship backbone).

Role-equivalent to the reference's spconv ``SpMiddleResNetFHD``
(/root/reference/det3d/models/backbones/scn.py:97-192): polar voxels in,
stride-8 BEV map out, with the same stage/channel structure from the
quarter-resolution stage onward (64ch @ 1/4, 128ch @ 1/8, z-squeeze to a
(B, n_az/8, n_r/8, 2*128) BEV map).

Why not a literal sparse-conv port: on TPU every fine-grained random
access (27-neighbor gathers, rulebook sorts, per-row scatters) measured
5-70 ms *per op* at flagship scale (see tools/profile_sparse.py), while
dense 3D convolutions at C>=64 on <=1M-cell grids run at >100 TFLOP/s on
the MXU. So this backbone restructures the computation TPU-first:

  1. per-voxel stem MLP (pure matmul) over the full-resolution voxel list
     — replaces the full/half-res submanifold stages; sub-cell geometry is
     preserved by decorating each voxel with its fractional offset inside
     the pooled cell (the PointPillars decoration trick);
  2. ONE scatter-max pools the voxel features into a dense quarter-res
     polar canvas (n_z/8, n_az/4, n_r/4, 64) — the only sparse op left;
  3. dense 3D conv stages mirroring conv3/conv4 of the reference
     (entry conv + residual blocks, BatchNorm+ReLU), a strided stage to
     1/8 resolution, and the reference's z-squeeze ``extra_conv``
     (kernel (3,1,1), stride (2,1,1), scn.py:157-163);
  4. channel fold to NHWC BEV exactly like the torch ``.dense()`` +
     ``view(N, C*D, H, W)`` (scn.py:186-191).

The gather-matmul sparse backbone (``backbone.py``) remains available for
small grids and as the bit-parity reference implementation.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stem_pallas
from ..utils.dtypes import resolve_compute_dtype
from .registry import BACKBONES


class DenseConvBlock(nn.Module):
    """3D conv + BN + ReLU.

    ``factorized=True`` (only meaningful for 3x3x3 kernels) applies the same
    R(2+1)D split as DenseBasicBlock: a (1,3,3) BEV conv carrying the
    spatial stride, then a (3,1,1) z conv carrying the z stride."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.bfloat16
    factorized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.factorized and tuple(self.kernel) == (3, 3, 3):
            sz, sy, sx = self.stride
            x = nn.Conv(self.features, (1, 3, 3), strides=(1, sy, sx),
                        padding=self.padding, use_bias=False,
                        dtype=self.dtype, name="conv_bev")(x)
            x = nn.Conv(self.features, (3, 1, 1), strides=(sz, 1, 1),
                        padding=self.padding, use_bias=False,
                        dtype=self.dtype, name="conv_z")(x)
        else:
            x = nn.Conv(self.features, self.kernel, strides=self.stride,
                        padding=self.padding, use_bias=False,
                        dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class DenseBasicBlock(nn.Module):
    """Two 3x3x3 convs with residual — the dense analog of the reference's
    SparseBasicBlock (scn.py:51-95).

    ``factorized=True`` replaces each 3x3x3 conv with a (1,3,3) BEV conv
    followed by a (3,1,1) z conv (the R(2+1)D decomposition): 12/27 of the
    FLOPs for the same receptive field, measured ~27% faster per block on
    chip at flagship shapes; the flagship config opts in."""

    features: int
    dtype: Any = jnp.bfloat16
    factorized: bool = False

    def _conv(self, x, name):
        if not self.factorized:
            return nn.Conv(self.features, (3, 3, 3), use_bias=False,
                           dtype=self.dtype, name=name)(x)
        y = nn.Conv(self.features, (1, 3, 3), use_bias=False,
                    dtype=self.dtype, name=f"{name}_bev")(x)
        return nn.Conv(self.features, (3, 1, 1), use_bias=False,
                       dtype=self.dtype, name=f"{name}_z")(y)

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        y = self._conv(x, "conv1")
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(y)
        y = nn.relu(y).astype(self.dtype)
        y = self._conv(y, "conv2")
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(y)
        return nn.relu(y.astype(self.dtype) + identity)


class Dense2DBlock(nn.Module):
    """2D 3x3 conv + BN + ReLU (trunk2d stage convs)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class Dense2DResBlock(nn.Module):
    """Two 2D 3x3 convs with residual."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        y = nn.Conv(self.features, (3, 3), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(y)
        return nn.relu(y.astype(self.dtype) + identity)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _scatter_max_rows(vals, lin, cells, zero_base):
    """(P, C) rows scatter-maxed into (cells, C) by lin (P,); rows with
    lin == cells are dropped. zero_base: 0-init (post-ReLU fold2d path)
    vs neg-inf init (general path)."""
    c = vals.shape[-1]
    if zero_base:
        base = jnp.zeros((cells + 1, c), vals.dtype)
    else:
        base = jnp.full((cells + 1, c), jnp.finfo(vals.dtype).min,
                        vals.dtype)
    return base.at[lin].max(vals, mode="drop")[:cells]


def _scatter_max_rows_fwd(vals, lin, cells, zero_base):
    out = _scatter_max_rows(vals, lin, cells, zero_base)
    return out, (vals, lin, out)


def _scatter_max_rows_bwd(cells, zero_base, res, g):
    """Gather-based max-scatter VJP: the cotangent of each canvas cell
    flows to the point rows whose value EQUALS the cell's max (two
    vectorized gathers + a compare), replacing XLA's scatter-lowered
    transpose — measured 11.8 ms -> ~1 ms for the flagship 216k x 64
    scatter (tools/probes/train_bwd_anatomy.py: the scatter VJP was the
    single largest backward line item). Tie semantics: every tied winner
    receives the full cotangent (a valid max subgradient); in this
    backbone ties are post-ReLU zeros whose gradient the upstream ReLU
    VJP kills anyway (relu'(0) = 0), so training numerics match the XLA
    path (pinned by test_backbone_dense.py)."""
    vals, lin, out = res
    gpad = jnp.concatenate([g, jnp.zeros_like(g[:1])], axis=0)
    opad = jnp.concatenate([out, jnp.zeros_like(out[:1])], axis=0)
    won = vals == opad[lin]
    gv = jnp.where(won, gpad[lin], 0).astype(vals.dtype)
    return gv, None


_scatter_max_rows.defvjp(_scatter_max_rows_fwd, _scatter_max_rows_bwd)


def scatter_canvas(feats, coords, mask, canvas_shape, z_pool, bev_pool,
                   dtype=jnp.float32, fold2d=False):
    """Scatter-max voxel features into a dense pooled canvas.

    Args:
      feats: (B, N, C) voxel features. MUST be non-negative (post-ReLU stem
        outputs) when ``fold2d=True`` — the empty-cell cleanup relies on it.
      coords: (B, N, 3) int32 full-resolution (z, az, r) coords.
      mask: (B, N) bool.
      canvas_shape: static (cz, cy, cx) pooled grid.
      z_pool / bev_pool: pooling factors from full-res coords.
      fold2d: scatter with a z-MINOR linear index so the z-fold to 2D
        channels is a free row-major reshape (no 90 MB relayout copy), and
        clean empty cells with ``max(canvas, 0)`` instead of an
        occupancy-select (one fused elementwise pass instead of a
        column-read + select sweep; bit-exact for post-ReLU features).
    Returns:
      fold2d=False: canvas (B, cz, cy, cx, C), occupancy (B, cz, cy, cx).
      fold2d=True:  canvas (B, cy, cx, cz*C) with channel order
        [z0c0..z0c(C-1), z1c0, ...] (matches the trunk2d fold), occupancy
        (B, cy, cx, cz).
    """
    cz, cy, cx = canvas_shape
    cells = cz * cy * cx
    c = feats.shape[-1]

    def one(f, co, m):
        lz = co[:, 0] // z_pool
        ly = co[:, 1] // bev_pool
        lx = co[:, 2] // bev_pool
        if fold2d:
            lin = (ly * cx + lx) * cz + lz
        else:
            lin = (lz * cy + ly) * cx + lx
        lin = jnp.where(m, lin, cells)
        neg = jnp.finfo(dtype).min
        if fold2d:
            # 0-init max-scatter: for post-ReLU (>= 0) features, max with a
            # zero base equals the neg-inf-init + clamp-at-0 cleanup, so the
            # empty-cell pass over the 94 MB canvas disappears entirely
            canvas = _scatter_max_rows(
                jnp.where(m[:, None], f, 0).astype(dtype), lin, cells, True)
            # occupancy via a 1-wide count scatter; lazily computed — XLA
            # drops it (and this second scatter) when no seg head consumes it
            cnt = jnp.zeros((cells + 1, 1), jnp.int32).at[lin].add(
                jnp.ones((lin.shape[0], 1), jnp.int32), mode="drop")[:cells]
            occ = (cnt[:, 0] > 0).reshape(cy, cx, cz)
            return canvas.reshape(cy, cx, cz * c), occ
        canvas = _scatter_max_rows(
            jnp.where(m[:, None], f, neg).astype(dtype), lin, cells, False)
        # occupancy derived from the max itself instead of a second
        # 200k-update scatter: any finite scattered value exceeds
        # finfo.min/2, while untouched cells stay at finfo.min
        occ = canvas[:, 0] > neg * 0.5
        canvas = jnp.where(occ[:, None], canvas, 0)
        return canvas.reshape(cz, cy, cx, c), occ.reshape(cz, cy, cx)

    return jax.vmap(one)(feats, coords, mask)


@BACKBONES.register_module(name="PolarDenseFHD")
class PolarDenseFHD(nn.Module):
    """Dense TPU middle extractor; see module docstring.

    Attrs mirror the reference registry signature (num_input_features,
    ds_factor) plus TPU knobs. ds_factor = bev_pool * 2 (the stage-B
    stride) and must equal 8 for the standard configs.
    """

    num_input_features: int = 7
    ds_factor: int = 8
    bev_pool: int = 4        # az/r pooling into the canvas (1/4 res)
    z_pool: int = 8          # z pooling into the canvas
    stem_features: Sequence[int] = (32, 64)
    stage_a_blocks: int = 1  # residual blocks @ 1/4 res (C=64)
    stage_b_blocks: int = 2  # residual blocks @ 1/8 res (C=128)
    compute_dtype: Any = jnp.bfloat16
    factorized: bool = False  # R(2+1)D conv decomposition in the blocks
    # trunk2d folds z into channels right after the scatter and runs the
    # whole trunk as 2D convs: (cz, cy, cx, C) -> (cy, cx, cz*C) ->
    # 3x3 @ a2d_features -> res block -> strided 3x3 @ out_features ->
    # res blocks -> BEV. Fewer/wider convs: ~1/3 the HBM traffic of the
    # factorized-3D trunk at the bandwidth-bound 1/4-res stage (the 3D
    # trunk re-reads the 94 MB canvas per conv+BN+relu pass); z mixing
    # is global from the first conv instead of banded.
    trunk2d: bool = False
    a2d_features: int = 160   # stage-A width in trunk2d mode
    out_features: int = 256   # BEV channels in trunk2d mode
    # probe-only: stop_gradient after "scatter" (kills the scatter-max VJP
    # + stem backward) for per-phase backward attribution
    # (tools/probes/train_anatomy.py); never set in production configs
    sg_after: Tuple[str, ...] = ()

    def _canvas_shape(self, input_shape):
        n_r, n_az, n_z = (int(s) for s in input_shape)
        assert n_z % self.z_pool == 0 and n_az % self.bev_pool == 0 \
            and n_r % self.bev_pool == 0, (
                f"grid {input_shape} not divisible by pools "
                f"({self.z_pool},{self.bev_pool})")
        return (n_z // self.z_pool, n_az // self.bev_pool,
                n_r // self.bev_pool)

    def setup(self):
        dt = resolve_compute_dtype(self.compute_dtype)
        # The stem runs CHANNEL-MAJOR (B, C, P): point/voxel buffers are
        # (P, ~10-64) and TPU pads the minor dim to 128 lanes, so row-major
        # stem passes read ~12x their logical bytes (measured 5.5 ms of a
        # 22 ms frame). Explicit params (not nn.Dense) let both layouts
        # share one parameter set.
        cin = self.num_input_features + 3  # + fractional-offset decoration
        dims = [cin] + list(self.stem_features)
        self.stem_kernels = [
            self.param(f"stem{i}_kernel", nn.initializers.lecun_normal(),
                       (dims[i], dims[i + 1]))
            for i in range(len(self.stem_features))]
        self.stem_scales = [
            self.param(f"stem{i}_scale", nn.initializers.ones, (f,))
            for i, f in enumerate(self.stem_features)]
        self.stem_shifts = [
            self.param(f"stem{i}_bias", nn.initializers.zeros, (f,))
            for i, f in enumerate(self.stem_features)]
        self.stem_means = [
            self.variable("batch_stats", f"stem{i}_mean",
                          lambda f=f: jnp.zeros((f,)))
            for i, f in enumerate(self.stem_features)]
        self.stem_vars = [
            self.variable("batch_stats", f"stem{i}_var",
                          lambda f=f: jnp.ones((f,)))
            for i, f in enumerate(self.stem_features)]
        if self.trunk2d:
            self.conv_a2d = Dense2DBlock(self.a2d_features, dtype=dt,
                                         name="conv_a2d")
            self.blocks_a2d = [
                Dense2DResBlock(self.a2d_features, dtype=dt,
                                name=f"block_a2d{i}")
                for i in range(self.stage_a_blocks)]
            self.conv_b2d = Dense2DBlock(self.out_features, stride=2,
                                         dtype=dt, name="conv_b2d")
            self.blocks_b2d = [
                Dense2DResBlock(self.out_features, dtype=dt,
                                name=f"block_b2d{i}")
                for i in range(self.stage_b_blocks)]
            return
        self.conv_a = DenseConvBlock(self.stem_features[-1], dtype=dt,
                                     factorized=self.factorized,
                                     name="conv_a")
        self.blocks_a = [
            DenseBasicBlock(self.stem_features[-1], dtype=dt,
                            factorized=self.factorized, name=f"block_a{i}")
            for i in range(self.stage_a_blocks)]
        self.conv_b = DenseConvBlock(2 * self.stem_features[-1],
                                     stride=(1, 2, 2), dtype=dt,
                                     factorized=self.factorized,
                                     name="conv_b")
        self.blocks_b = [
            DenseBasicBlock(2 * self.stem_features[-1], dtype=dt,
                            factorized=self.factorized, name=f"block_b{i}")
            for i in range(self.stage_b_blocks)]
        self.extra_conv = DenseConvBlock(
            2 * self.stem_features[-1], kernel=(3, 1, 1), stride=(2, 1, 1),
            padding="VALID", dtype=dt, name="extra_conv")

    def _stem_t(self, x, mask, train):
        """Channel-major stem: x (B, C, P), mask (B, P) -> (B, F, P).

        BatchNorm semantics match the previous nn.BatchNorm stem: stats
        over all (batch, point) positions of the mask-zeroed features.

        At inference on an accelerator the 2-layer stem runs as one fused
        Pallas kernel (ops/stem_pallas.py; ~1.05 -> ~0.2 ms/frame);
        training and CPU keep the XLA stages (BN stats + autodiff)."""
        dt = resolve_compute_dtype(self.compute_dtype)
        if (not train and not self.is_initializing()
                and len(self.stem_features) == 2 and stem_pallas.available()):
            eps = 1e-3
            ab = []
            for i in range(2):
                a = self.stem_scales[i] * jax.lax.rsqrt(
                    self.stem_vars[i].value + eps)
                ab.append((a, self.stem_shifts[i]
                           - self.stem_means[i].value * a))
            fused = lambda xb, mb: stem_pallas.stem2_channel_major(
                xb, mb,
                self.stem_kernels[0].T.astype(dt), ab[0][0], ab[0][1],
                self.stem_kernels[1].T.astype(dt), ab[1][0], ab[1][1])
            return jax.vmap(fused)(x.astype(dt), mask)
        for i in range(len(self.stem_features)):
            x = jnp.einsum("bcp,cf->bfp", x,
                           self.stem_kernels[i].astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            x = x * mask[:, None, :].astype(dt)
            xf = x.astype(jnp.float32)
            if train:
                mean = xf.mean(axis=(0, 2))
                var = xf.var(axis=(0, 2))
                if not self.is_initializing():
                    self.stem_means[i].value = (
                        0.99 * self.stem_means[i].value + 0.01 * mean)
                    self.stem_vars[i].value = (
                        0.99 * self.stem_vars[i].value + 0.01 * var)
            else:
                mean = self.stem_means[i].value
                var = self.stem_vars[i].value
            y = (xf - mean[:, None]) * jax.lax.rsqrt(var[:, None] + 1e-3)
            y = y * self.stem_scales[i][:, None] + self.stem_shifts[i][:, None]
            x = nn.relu(y).astype(dt)
        return x

    def _stem(self, x, mask, train):
        """Row-major wrapper: (B, N, C) in / (B, N, F) out (voxel path)."""
        return self._stem_t(x.transpose(0, 2, 1), mask,
                            train).transpose(0, 2, 1)

    def _trunk(self, canvas, occ, train):
        if self.trunk2d:
            # canvas arrives z-FOLDED from scatter_canvas(fold2d=True):
            # (B, cy, cx, cz*C), occ (B, cy, cx, cz). The 5D views for the
            # multi_scale contract are lazy transposes — XLA drops them
            # when no seg head consumes them.
            bb, cy, cx, cf = canvas.shape
            cz = occ.shape[-1]
            x = canvas
            a = self.conv_a2d(x, train)
            for blk in self.blocks_a2d:
                a = blk(a, train)
            b = self.conv_b2d(a, train)
            for blk in self.blocks_b2d:
                b = blk(b, train)
            canvas5 = canvas.reshape(bb, cy, cx, cz, cf // cz).transpose(
                0, 3, 1, 2, 4)
            multi_scale = {"canvas": canvas5,
                           "occ": occ.transpose(0, 3, 1, 2), "stage_a": a,
                           "stage_b": b}
            return b.astype(jnp.float32), multi_scale
        a = self.conv_a(canvas, train)
        for blk in self.blocks_a:
            a = blk(a, train)
        b = self.conv_b(a, train)
        for blk in self.blocks_b:
            b = blk(b, train)
        e = self.extra_conv(b, train)
        # channel fold: (B, nz', ny, nx, C) -> (B, ny, nx, C*nz')
        # (C outer, D inner — matches torch view(N, C*D, H, W))
        bb, nz2, ny, nx, cc = e.shape
        bev = e.transpose(0, 2, 3, 4, 1).reshape(bb, ny, nx, cc * nz2)
        multi_scale = {"canvas": canvas, "occ": occ, "stage_a": a,
                       "stage_b": b}
        return bev.astype(jnp.float32), multi_scale

    def encode_points(self, points, mask, input_shape, pc_range,
                      train: bool = True):
        """Point-input fast path: per-point decorated MLP -> scatter-max.

        Skips voxelization entirely (no sort, no segment ops): the full-res
        voxel structure only fed a mean VFE whose information the stem's
        sub-cell offset decorations already carry. points are cylinder
        layout (B, P, C) [rho, phi, z, ...]; returns (bev, multi_scale).
        """
        n_r, n_az, n_z = (int(s) for s in input_shape)
        canvas_shape = self._canvas_shape(input_shape)
        dt = resolve_compute_dtype(self.compute_dtype)
        pr = jnp.asarray(pc_range, jnp.float32)
        cell = jnp.asarray([
            (pc_range[3] - pc_range[0]) / n_r * self.bev_pool,
            (pc_range[4] - pc_range[1]) / n_az * self.bev_pool,
            (pc_range[5] - pc_range[2]) / n_z * self.z_pool,
        ], jnp.float32)

        # channel-major throughout the decorate+stem: one transposed read
        # of the (B, P, ~7) buffer instead of lane-padded passes (the
        # minor dim of a (P, 7) f32 tensor pads 7 -> 128 on TPU).
        # Slice to num_input_features like the reference VFE does
        # (readers/voxel_encoder.py:15-22) — nusc pipelines carry extra
        # trailing columns (time lag, rho/phi decorations) the config's
        # channel count excludes
        pts_t = points.transpose(0, 2, 1)[:, : self.num_input_features]
        rza_t = pts_t[:, :3]  # rho, phi, z
        g = (rza_t - pr[jnp.asarray([0, 1, 2])][None, :, None]) \
            / cell[None, :, None]
        idx_t = jnp.floor(g).astype(jnp.int32)
        frac_t = g - idx_t - 0.5
        lim = jnp.asarray([canvas_shape[2], canvas_shape[1], canvas_shape[0]])
        inb = mask & jnp.all(
            (idx_t >= 0) & (idx_t < lim[None, :, None]), axis=1)
        x_t = jnp.concatenate(
            [pts_t.astype(jnp.float32), frac_t], axis=1).astype(dt)
        x = self._stem_t(x_t, inb, train).transpose(0, 2, 1)
        coords = jnp.stack([idx_t[:, 2], idx_t[:, 1], idx_t[:, 0]], -1)
        canvas, occ = scatter_canvas(
            x, coords, inb, canvas_shape, 1, 1, dtype=dt,
            fold2d=self.trunk2d)
        if "scatter" in self.sg_after:
            canvas = jax.lax.stop_gradient(canvas)
        return self._trunk(canvas, occ, train)

    def __call__(self, voxel_features, coords, mask, input_shape,
                 train: bool = True):
        """
        Args:
          voxel_features: (B, N, C) per-voxel features (mean VFE output).
          coords: (B, N, 3) int32 (z, azimuth, range) full-res coords.
          mask: (B, N) bool.
          input_shape: static (n_r, n_az, n_z) grid.
        Returns:
          bev: (B, n_az/8, n_r/8, C_bev) dense BEV map.
          multi_scale: dict of dense stage tensors (canvas/stage_a/stage_b).
        """
        canvas_shape = self._canvas_shape(input_shape)
        dt = resolve_compute_dtype(self.compute_dtype)

        # --- stem: decorated per-voxel MLP (full resolution, pure matmul)
        frac = (coords.astype(jnp.float32) %
                jnp.asarray([self.z_pool, self.bev_pool, self.bev_pool],
                            jnp.float32)) / jnp.asarray(
                    [self.z_pool, self.bev_pool, self.bev_pool], jnp.float32)
        x = jnp.concatenate(
            [voxel_features.astype(jnp.float32), frac - 0.5], axis=-1
        ).astype(dt)
        x = self._stem(x, mask, train)

        # --- the one sparse op: pooled scatter into the dense canvas
        canvas, occ = scatter_canvas(
            x, coords, mask, canvas_shape, self.z_pool, self.bev_pool,
            dtype=dt, fold2d=self.trunk2d)
        return self._trunk(canvas, occ, train)

"""Streaming RPN necks: trailing-edge / bidirectional context padding.

Re-implements /root/reference/det3d/models/necks/rpn_context.py:10-214 in
two TPU-native forms:

1. Sequential-sector modules (``RPNTECP``, ``RPNBDCP``) — functional context
   carries for latency-mode streaming inference: each conv consumes the
   previous sector's cached boundary rows and emits its own, exactly like
   ConvContext/ConvBDCP. Contexts are explicit pytrees (no module state).

2. ``RPNHalo`` — the full-sweep/sharded form: azimuth lives on the
   ``azimuth`` mesh axis under shard_map and every conv uses a cyclic
   ppermute halo (partner_tpu.parallel.halo.ring_halo); with one shard this
   is exactly the reference's circular padding (rpn_context.py:120,138).

Maps are NHWC (B, az, r, C); the context/halo axis is axis 1.
"""

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.halo import ring_halo
from .layers import BatchNorm
from .registry import NECKS


class ConvContextTE(nn.Module):
    """Conv3x3 with trailing-edge azimuth padding (ConvContext,
    rpn_context.py:10-43)."""

    features: int
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, prev_ctx, train: bool = True):
        p = self.padding
        cur_ctx = x[:, -p:, :, :]
        if prev_ctx is None:
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        else:
            xp = jnp.concatenate([prev_ctx, x], axis=1)
            xp = jnp.pad(xp, ((0, 0), (0, p), (p, p), (0, 0)))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="VALID", use_bias=False)(xp)
        y = BatchNorm(use_running_average=not train)(y)
        return nn.relu(y), cur_ctx


class ConvBDCPSeq(nn.Module):
    """Conv3x3 with bidirectional padding (ConvBDCP, rpn_context.py:96-162):
    trailing edge from the previous sector's cache, leading edge from the
    previous sweep's features at the next sector's position."""

    features: int
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, prev_ctx, next_rows, train: bool = True):
        """prev_ctx: (B, az, r, C) previous-sector full feature (cache) or
        None; next_rows: (B, pad, r, C) leading-edge rows (prev sweep) or
        None."""
        p = self.padding
        cur_ctx = x
        lead = (prev_ctx[:, -p:] if prev_ctx is not None
                else jnp.zeros_like(x[:, :p]))
        tail = (next_rows if next_rows is not None
                else jnp.zeros_like(x[:, :p]))
        xp = jnp.concatenate([lead, x, tail], axis=1)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (p, p), (0, 0)))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="VALID", use_bias=False)(xp)
        y = BatchNorm(use_running_average=not train)(y)
        return nn.relu(y), cur_ctx


class _StreamRPNBase(nn.Module):
    layer_nums: Sequence[int] = (2, 2)
    ds_layer_strides: Sequence[int] = (1, 2)
    ds_num_filters: Sequence[int] = (64, 128)
    us_layer_strides: Sequence[int] = (1, 2)
    us_num_filters: Sequence[int] = (64, 64)
    num_input_features: int = 64
    nsectors: int = 1

    def _deblock(self, x, j, train):
        stride = self.us_layer_strides[j]
        if stride > 1:
            u = nn.ConvTranspose(
                self.us_num_filters[j], (stride, stride),
                strides=(stride, stride), use_bias=False,
                name=f"deblock{j}_conv",
            )(x)
        else:
            k = int(round(1 / stride))
            u = nn.Conv(self.us_num_filters[j], (k, k), strides=(k, k),
                        use_bias=False, name=f"deblock{j}_conv")(x)
        u = BatchNorm(use_running_average=not train, name=f"deblock{j}_bn")(u)
        return nn.relu(u)


@NECKS.register_module(name="RPNTECP")
class RPNTECP(_StreamRPNBase):
    """Trailing-edge context-padding RPN (sequential sector streaming)."""

    @nn.compact
    def __call__(self, x, prev_context: Optional[List] = None,
                 train: bool = True):
        ups, new_context = [], []
        ctx_i = 0
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            for li in range(n_layers + 1):
                prev = None if prev_context is None else prev_context[ctx_i]
                stride = self.ds_layer_strides[i] if li == 0 else 1
                x, ctx = ConvContextTE(
                    self.ds_num_filters[i], stride,
                    name=f"block{i}_conv{li}",
                )(x, prev, train)
                new_context.append(ctx)
                ctx_i += 1
            j = i - upsample_start
            if j >= 0:
                ups.append(self._deblock(x, j, train))
        out = jnp.concatenate(ups, axis=-1) if ups else x
        return out, new_context


@NECKS.register_module(name="RPNBDCP")
class RPNBDCP(_StreamRPNBase):
    """Bidirectional context-padding RPN: previous sector cache (trailing)
    + previous sweep features (leading)."""

    @nn.compact
    def __call__(self, x, prev_context: Optional[List] = None,
                 prev_sweep: Optional[List] = None, sec_id: int = 0,
                 train: bool = True):
        """prev_sweep: per-conv list of FULL-sweep feature maps from the
        previous sweep at this conv's resolution; the leading-edge rows of
        the next sector are sliced out of them (rpn_context.py:136-158)."""
        ups, new_context = [], []
        ctx_i = 0
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            for li in range(n_layers + 1):
                prev = None if prev_context is None else prev_context[ctx_i]
                nxt = None
                if prev_sweep is not None:
                    # leading-edge rows come from the previous sweep's full
                    # map at the next sector's azimuth start (cyclic)
                    full = prev_sweep[ctx_i]
                    az = x.shape[1]
                    start = ((sec_id + 1) * az) % full.shape[1]
                    nxt = jnp.roll(full, -start, axis=1)[:, :1, :, :]
                stride = self.ds_layer_strides[i] if li == 0 else 1
                x, ctx = ConvBDCPSeq(
                    self.ds_num_filters[i], stride,
                    name=f"block{i}_conv{li}",
                )(x, prev, nxt, train)
                new_context.append(ctx)
                ctx_i += 1
            j = i - upsample_start
            if j >= 0:
                ups.append(self._deblock(x, j, train))
        out = jnp.concatenate(ups, axis=-1) if ups else x
        return out, new_context


@NECKS.register_module(name="RPNHalo")
class RPNHalo(_StreamRPNBase):
    """Full-sweep RPN with cyclic azimuth halos.

    Run standalone (single shard -> circular conv along azimuth) or inside
    shard_map over the 'azimuth' mesh axis (ppermute ring halos over ICI).
    """

    axis_name: Optional[str] = None

    def _halo(self, x, pad):
        if self.axis_name is None:
            # single shard: circular azimuth pad
            return jnp.concatenate([x[:, -pad:], x, x[:, :pad]], axis=1)
        return ring_halo(x, pad, self.axis_name, axis=1)

    @nn.compact
    def __call__(self, x, train: bool = True):
        ups = []
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            for li in range(n_layers + 1):
                stride = self.ds_layer_strides[i] if li == 0 else 1
                xp = self._halo(x, 1)
                xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
                x = nn.Conv(self.ds_num_filters[i], (3, 3),
                            strides=(stride,) * 2, padding="VALID",
                            use_bias=False, name=f"block{i}_conv{li}")(xp)
                x = BatchNorm(use_running_average=not train,
                              name=f"block{i}_bn{li}")(x)
                x = nn.relu(x)
            j = i - upsample_start
            if j >= 0:
                ups.append(self._deblock(x, j, train))
        return jnp.concatenate(ups, axis=-1) if ups else x


@NECKS.register_module(name="RPNUber")
class RPNUber(_StreamRPNBase):
    """Previous-sweep feature concat neck (necks/rpn_uber.py): each block's
    input is concatenated with the previous sweep's features at the same
    resolution; contexts returned are this sweep's per-block inputs."""

    @nn.compact
    def __call__(self, x, prev_sweep=None, train: bool = True):
        ups, new_ctx = [], []
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            new_ctx.append(x)
            prev = (prev_sweep[i] if prev_sweep is not None
                    else jnp.zeros_like(x))
            x = jnp.concatenate([x, prev], axis=-1)
            for li in range(n_layers + 1):
                stride = self.ds_layer_strides[i] if li == 0 else 1
                x = nn.Conv(self.ds_num_filters[i], (3, 3),
                            strides=(stride,) * 2, padding=1,
                            use_bias=False, name=f"block{i}_conv{li}")(x)
                x = BatchNorm(use_running_average=not train,
                              name=f"block{i}_bn{li}")(x)
                x = nn.relu(x)
            j = i - upsample_start
            if j >= 0:
                ups.append(self._deblock(x, j, train))
        out = jnp.concatenate(ups, axis=-1) if ups else x
        return out, new_ctx


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM over BEV maps — the temporal memory of the
    reference's streaming waymo detectors (streaming_waymo.py:30-60)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, state):
        """x (B, H, W, C); state = (h, c) same spatial shape or None."""
        if state is None:
            h = jnp.zeros(x.shape[:-1] + (self.features,), x.dtype)
            c = jnp.zeros_like(h)
        else:
            h, c = state
        z = nn.Conv(4 * self.features, (self.kernel, self.kernel),
                    padding="SAME", name="gates")(
            jnp.concatenate([x, h], axis=-1))
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)


@NECKS.register_module(name="RPNWaymo")
@NECKS.register_module(name="RPNWaymoLSTM")
class RPNWaymoLSTM(_StreamRPNBase):
    """RPN with a ConvLSTM memory on the input canvas (the RPNWaymo /
    PointPillarsLSTM pattern: necks/rpn_waymo.py + streaming_waymo.py).
    Registered under both our name and the reference's ``RPNWaymo``
    (necks/rpn_waymo.py) for config compatibility."""

    @nn.compact
    def __call__(self, x, prev_state=None, train: bool = True):
        h, new_state = ConvLSTMCell(self.num_input_features,
                                    name="memory")(x, prev_state)
        x = jnp.concatenate([x, h], axis=-1)
        ups = []
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            for li in range(n_layers + 1):
                stride = self.ds_layer_strides[i] if li == 0 else 1
                x = nn.Conv(self.ds_num_filters[i], (3, 3),
                            strides=(stride,) * 2, padding=1,
                            use_bias=False, name=f"block{i}_conv{li}")(x)
                x = BatchNorm(use_running_average=not train,
                              name=f"block{i}_bn{li}")(x)
                x = nn.relu(x)
            j = i - upsample_start
            if j >= 0:
                ups.append(self._deblock(x, j, train))
        out = jnp.concatenate(ups, axis=-1) if ups else x
        return out, new_state

"""PARTNER global representation re-alignment attention (SetBlock stack).

TPU-native re-implementation of
/root/reference/det3d/models/utils/set_transformer.py:56-535. The module
operates on the polar BEV map (B, H=range, W=azimuth, C) and per-cell
cartesian positions, and routes global context through H' keypoints per
azimuth column:

  1. keypoint init — channel-mean saliency, local-max NMS along range,
     top-H' per column (set_transformer.py:134-148);
  2. SectorAttention — keypoints query their azimuth column (144 cells),
     with a relative-position bias MLP over cartesian deltas (:262-354);
  3. RangeAttention — keypoint <-> keypoint window attention over
     (H', range_window) windows (:169-259);
  4. SectorAttentionV2 — cells query their column's keypoints (broadcast
     back, :357-440);
  5. residual + MLP, with alternating azimuth shift for cyclic coverage.

Deliberate deviation from the reference: SectorAttention's torch code
reshapes the (B, L, C) keypoint tensor with ``view(B, C, H, W)``
(set_transformer.py:333-336), silently scrambling the token/channel layout;
here queries keep their true (keypoint, column) correspondence.

Everything is dense window einsum — XLA fuses the QK/AV matmuls onto the
MXU; there is no gather-heavy inner loop beyond the single top-k.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import DropPath, Mlp, PosEmbedMLP, decompose_pos_mlp


def _pair_bias(parent, mlp, pos_a, pos_b, a_axis, b_axis, train):
    """Relative-position bias mlp(pos_a - pos_b) with broadcast axes.

    At inference the first linear+BN layer is decomposed per token
    (see layers.decompose_pos_mlp) so the (..., 2) pair tensor is never
    materialized; at train time (BN batch stats) the direct per-pair
    path runs. Both branches create/use the identical param tree."""
    if train or parent.is_initializing():
        rel = (jnp.expand_dims(pos_a, a_axis)
               - jnp.expand_dims(pos_b, b_axis))
        return mlp(rel, train)
    mlp(jnp.zeros((1, 2), pos_a.dtype), train=False)  # bind params
    proj, finish = decompose_pos_mlp(mlp, mlp.dtype)
    return finish(jnp.expand_dims(proj(pos_a), a_axis)
                  - jnp.expand_dims(proj(pos_b), b_axis))


def _split_heads(x, nh):
    *lead, c = x.shape
    return x.reshape(*lead, nh, c // nh)


class SectorAttention(nn.Module):
    """Keypoints (B, Hk, W, C) attend to their azimuth column (B, H, W, C)."""

    num_heads: int
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    gelu_approx: bool = True
    dtype: Any = jnp.float32  # compute dtype; residuals/softmax stay f32

    @nn.compact
    def __call__(self, s, x, s_pos, x_pos, deterministic=True, train=True):
        c = s.shape[-1]
        nh = self.num_heads
        dt = self.dtype
        shortcut = s
        q = _split_heads(
            nn.Dense(c, dtype=dt, name="proj_q")(s.astype(dt)), nh)
        k = _split_heads(
            nn.Dense(c, dtype=dt, name="proj_k")(x.astype(dt)), nh)
        v = _split_heads(
            nn.Dense(c, dtype=dt, name="proj_v")(x.astype(dt)), nh)

        scale = (c // nh) ** -0.5
        attn = jnp.einsum("bqwhd,bkwhd->bwhqk", q * jnp.asarray(scale, dt), k,
                          preferred_element_type=jnp.float32)

        # bias over (B,Hk,H,W,2) rel deltas, decomposed at inference
        bias = _pair_bias(self, PosEmbedMLP(nh, dtype=dt, name="pos_mlp"),
                          s_pos, x_pos, 2, 1, train)
        attn = attn + bias.transpose(0, 3, 4, 1, 2).astype(jnp.float32)

        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bwhqk,bkwhd->bqwhd", attn, v,
                         preferred_element_type=jnp.float32).astype(dt)
        out = out.reshape(s.shape)
        out = nn.Dense(c, dtype=dt, name="proj")(out).astype(jnp.float32)
        s = shortcut + DropPath(self.drop_path)(out, deterministic)
        s = s + DropPath(self.drop_path)(
            Mlp(int(c * self.mlp_ratio), c, self.drop,
                approximate=self.gelu_approx, dtype=dt)(
                nn.LayerNorm(name="norm2")(s), deterministic
            ).astype(jnp.float32),
            deterministic,
        )
        return s


class RangeAttention(nn.Module):
    """Keypoint self-attention over (Hk, range_window) windows."""

    num_heads: int
    window_w: int = 8
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    gelu_approx: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, s_pos, deterministic=True, train=True):
        dt = self.dtype
        b, hk, w, c = s.shape
        nh, ww = self.num_heads, self.window_w
        nw = w // ww
        shortcut = s
        y = nn.LayerNorm(name="norm1")(s)

        def to_windows(t):
            # (B, Hk, W, C) -> (B, nw, Hk*ww, C), tokens h-major within window
            t = t.reshape(b, hk, nw, ww, -1)
            return t.transpose(0, 2, 1, 3, 4).reshape(b, nw, hk * ww, -1)

        yw = to_windows(y)
        pw = to_windows(s_pos)  # (B, nw, T, 2)

        yw = yw.astype(dt)
        q = _split_heads(nn.Dense(c, dtype=dt, name="proj_q")(yw), nh)
        k = _split_heads(nn.Dense(c, dtype=dt, name="proj_k")(yw), nh)
        v = _split_heads(nn.Dense(c, dtype=dt, name="proj_v")(yw), nh)
        scale = (c // nh) ** -0.5
        attn = jnp.einsum("bnqhd,bnkhd->bnhqk", q * jnp.asarray(scale, dt), k,
                          preferred_element_type=jnp.float32)

        # bias over (B,nw,T,T,2) rel deltas, decomposed at inference
        bias = _pair_bias(self, PosEmbedMLP(nh, dtype=dt, name="pos_mlp"),
                          pw, pw, 3, 2, train)
        attn = attn + bias.transpose(0, 1, 4, 2, 3).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, v,
                         preferred_element_type=jnp.float32
                         ).astype(dt).reshape(b, nw, hk * ww, c)
        # back to (B, Hk, W, C)
        out = out.reshape(b, nw, hk, ww, c).transpose(0, 2, 1, 3, 4).reshape(
            b, hk, w, c
        )
        out = nn.Dense(c, dtype=dt, name="proj")(out).astype(jnp.float32)
        s = shortcut + DropPath(self.drop_path)(out, deterministic)
        s = s + DropPath(self.drop_path)(
            Mlp(int(c * self.mlp_ratio), c, self.drop,
                approximate=self.gelu_approx, dtype=dt)(
                nn.LayerNorm(name="norm2")(s), deterministic
            ).astype(jnp.float32),
            deterministic,
        )
        return s


class SectorBroadcast(nn.Module):
    """Cells (B, H, W, C) query their column's keypoints (B, Hk, W, C).

    No residual/out-proj inside, matching SectorAttentionV2 (:430-440).
    """

    num_heads: int
    attn_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s, x, s_pos, x_pos, deterministic=True, train=True):
        c = x.shape[-1]
        nh = self.num_heads
        dt = self.dtype
        q = _split_heads(
            nn.Dense(c, dtype=dt, name="proj_q")(x.astype(dt)), nh)
        k = _split_heads(
            nn.Dense(c, dtype=dt, name="proj_k")(s.astype(dt)), nh)
        v = _split_heads(
            nn.Dense(c, dtype=dt, name="proj_v")(s.astype(dt)), nh)
        scale = (c // nh) ** -0.5
        attn = jnp.einsum("bqwhd,bkwhd->bwhqk", q * jnp.asarray(scale, dt), k,
                          preferred_element_type=jnp.float32)
        # bias over (B,H,Hk,W,2) rel deltas, decomposed at inference
        bias = _pair_bias(self, PosEmbedMLP(nh, dtype=dt, name="pos_mlp"),
                          x_pos, s_pos, 2, 1, train)
        attn = attn + bias.transpose(0, 3, 4, 1, 2).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bwhqk,bkwhd->bqwhd", attn, v,
                         preferred_element_type=jnp.float32)
        return out.reshape(x.shape)


class SetAttention(nn.Module):
    """One re-alignment round: keypoint init + 3 attentions + MLP."""

    num_heads: int = 4
    num_keypoints: int = 4       # H' per azimuth column
    range_window: int = 8        # azimuth columns per RangeAttention window
    shift: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    gelu_approx: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic=True, train=True):
        b, h, w, c = x.shape
        shift = (self.range_window // 2) if self.shift else 0

        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if shift:
            x = jnp.roll(x, -shift, axis=2)
            pos = jnp.roll(pos, -shift, axis=2)

        # keypoint init: saliency -> local-max along range -> top-k per column
        sal = x.mean(-1)  # (B, H, W)
        inner = jax.lax.reduce_window(
            sal, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1), "VALID"
        )
        local_max = jnp.zeros_like(sal).at[:, 1:-1, :].set(inner)
        sal = jnp.where(local_max == sal, sal, 0.0)

        _, top_idx = jax.lax.top_k(
            sal.transpose(0, 2, 1), self.num_keypoints
        )  # (B, W, Hk) indices into range axis
        top_idx = top_idx.transpose(0, 2, 1)  # (B, Hk, W)

        s = jnp.take_along_axis(x, top_idx[..., None], axis=1)  # (B,Hk,W,C)
        s_pos = jnp.take_along_axis(pos, top_idx[..., None], axis=1)

        s = SectorAttention(
            self.num_heads, self.drop, self.attn_drop, self.drop_path,
            self.mlp_ratio, self.gelu_approx, self.dtype,
            name="sector_attn1",
        )(s, x, s_pos, pos, deterministic, train)
        s = RangeAttention(
            self.num_heads, self.range_window, self.drop, self.attn_drop,
            self.drop_path, self.mlp_ratio, self.gelu_approx, self.dtype,
            name="range_attn",
        )(s, s_pos, deterministic, train)
        x = SectorBroadcast(self.num_heads, self.attn_drop, self.dtype,
                            name="sector_attn2")(
            s, x, s_pos, pos, deterministic, train
        )

        if shift:
            x = jnp.roll(x, shift, axis=2)

        x = nn.Dense(c, dtype=self.dtype, name="proj")(
            x.astype(self.dtype)).astype(jnp.float32)
        x = shortcut + DropPath(self.drop_path)(x, deterministic)
        x = x + DropPath(self.drop_path)(
            Mlp(int(c * self.mlp_ratio), c, self.drop,
                approximate=self.gelu_approx, dtype=self.dtype)(
                nn.LayerNorm(name="norm2")(x), deterministic
            ).astype(jnp.float32),
            deterministic,
        )
        return x


class SetBlockStack(nn.Module):
    """Depth-N SetAttention stack with alternating shift (VoxelNetV3's
    self.attns, detectors/voxelnet.py:192-199)."""

    depth: int = 2
    num_heads: int = 4
    num_keypoints: int = 4
    range_window: int = 8
    drop: float = 0.1
    attn_drop: float = 0.1
    drop_path: float = 0.1
    mlp_ratio: float = 4.0
    gelu_approx: bool = True
    dtype: Any = jnp.float32
    # remat each block in the backward pass (train-throughput lever,
    # tools/probes/train_anatomy.py)
    remat: bool = False

    @nn.compact
    def __call__(self, x, pos, deterministic=True, train=True):
        block_cls = (nn.remat(SetAttention, static_argnums=(3, 4))
                     if self.remat else SetAttention)
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                num_keypoints=self.num_keypoints,
                range_window=self.range_window,
                shift=(i % 2 == 1),
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                mlp_ratio=self.mlp_ratio,
                gelu_approx=self.gelu_approx,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, pos, deterministic, train)
        return x

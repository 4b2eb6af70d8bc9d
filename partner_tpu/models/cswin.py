"""CSWin transformer block on polar BEV token maps.

Re-implementation of the reference's cross-shaped-window attention
(/root/reference/det3d/models/utils/cswin.py:27-216): the channel dim is
split into two branches, one attending within full-row stripes (along
azimuth), one within full-column stripes (along range), each with a
conv-MLP relative-position bias on supplied (cartesian) coordinates —
imported by the reference's voxelnet (detectors/voxelnet.py:7) as an
alternative global-context block to the PARTNER SetBlock.

TPU-first shape discipline: stripes are plain reshapes of the NHWC map (no
im2win gather), attention is one batched einsum per branch, and the
rel-pos MLP runs once over the (N_win, L, L, 2) displacement tensor.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Mlp


def _stripes(x, h_sp, w_sp):
    """(B, H, W, C) -> (B * nH * nW, h_sp * w_sp, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // h_sp, h_sp, w // w_sp, w_sp, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h_sp * w_sp, c)


def _unstripes(x, h_sp, w_sp, h, w):
    """Inverse of _stripes."""
    l, c = x.shape[-2], x.shape[-1]
    b = x.shape[0] // ((h // h_sp) * (w // w_sp))
    x = x.reshape(b, h // h_sp, w // w_sp, h_sp, w_sp, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class LePEAttention(nn.Module):
    """Stripe attention with a conv-MLP relative-position bias
    (cswin.py:27-130). ``idx`` selects the stripe shape: 0 = row stripes
    (1, W), 1 = column stripes (H, 1), -1 = square windows."""

    idx: int
    num_heads: int
    split_size: int = 7

    @nn.compact
    def __call__(self, q, k, v, pos: Optional[jnp.ndarray] = None):
        """q/k/v: (B, H, W, C); pos: (H, W, 2) coordinates or None."""
        b, h, w, c = q.shape
        if self.idx == 0:
            h_sp, w_sp = 1, w
        elif self.idx == 1:
            h_sp, w_sp = h, 1
        else:
            h_sp = w_sp = self.split_size
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5

        def heads(t):
            s = _stripes(t, h_sp, w_sp)  # (B', L, C)
            return s.reshape(s.shape[0], s.shape[1], nh, hd)

        qs, ks, vs = heads(q) * scale, heads(k), heads(v)
        attn = jnp.einsum("blhd,bmhd->bhlm", qs, ks)

        if pos is not None:
            # pairwise displacement within one stripe -> per-head bias
            p = _stripes(pos[None], h_sp, w_sp)[..., :2]  # (nWin, L, 2)
            rel = p[:, :, None, :] - p[:, None, :, :]     # (nWin, L, L, 2)
            e = nn.Dense(16, name="pos_fc1")(rel)
            e = nn.LayerNorm(name="pos_ln")(e)
            e = nn.relu(e)
            e = nn.Dense(nh, name="pos_fc2")(e)           # (nWin, L, L, nh)
            bias = jnp.transpose(e, (0, 3, 1, 2))          # (nWin, nh, L, L)
            n_win = bias.shape[0]
            attn = attn.reshape(b, n_win, nh, attn.shape[-2], attn.shape[-1])
            attn = attn + bias[None]
            attn = attn.reshape(b * n_win, nh, attn.shape[-2], attn.shape[-1])

        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, vs)
        out = out.reshape(out.shape[0], out.shape[1], c)
        return _unstripes(out, h_sp, w_sp, h, w)


class CSWinBlock(nn.Module):
    """Pre-norm CSWin block (cswin.py:133-201): qkv projection, two
    half-channel stripe branches (rows + columns), channel concat, output
    projection, MLP — both residual."""

    num_heads: int
    split_size: int = 7
    mlp_ratio: float = 4.0
    last_stage: bool = False

    @nn.compact
    def __call__(self, x, pos: Optional[jnp.ndarray] = None):
        """x: (B, H, W, C); pos: (H, W, 2) or None."""
        b, h, w, c = x.shape
        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.last_stage:
            attn = LePEAttention(idx=-1, num_heads=self.num_heads,
                                 split_size=self.split_size,
                                 name="attn")(q, k, v, pos)
        else:
            half = c // 2
            nh = self.num_heads // 2
            a0 = LePEAttention(idx=0, num_heads=nh,
                               split_size=self.split_size, name="attn_row")(
                q[..., :half], k[..., :half], v[..., :half], pos)
            a1 = LePEAttention(idx=1, num_heads=nh,
                               split_size=self.split_size, name="attn_col")(
                q[..., half:], k[..., half:], v[..., half:], pos)
            attn = jnp.concatenate([a0, a1], axis=-1)

        x = x + nn.Dense(c, name="proj")(attn)
        y = nn.LayerNorm(name="norm2")(x)
        x = x + Mlp(hidden=int(c * self.mlp_ratio), out=c, name="mlp")(y)
        return x

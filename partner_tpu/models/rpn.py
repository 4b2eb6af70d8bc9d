"""RPN 2D BEV neck (flax, NHWC).

Mirrors /root/reference/det3d/models/necks/rpn.py:22-159: per-scale blocks of
(conv3x3 stride s + BN + ReLU) followed by ``layer_num`` conv3x3 units, then
per-scale upsampling deblocks (transpose conv for stride > 1, 1x1 conv for
stride 1) whose outputs are channel-concatenated.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..utils.dtypes import resolve_compute_dtype

from .layers import BatchNorm
from .registry import NECKS


@NECKS.register_module(name="RPN")
class RPN(nn.Module):
    layer_nums: Sequence[int] = (5, 5)
    ds_layer_strides: Sequence[int] = (1, 2)
    ds_num_filters: Sequence[int] = (128, 256)
    us_layer_strides: Sequence[int] = (1, 2)
    us_num_filters: Sequence[int] = (256, 256)
    num_input_features: int = 256
    # "bfloat16" halves conv time on the MXU; BN stats stay f32
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = resolve_compute_dtype(self.compute_dtype)
        x = x.astype(dt)
        ups = []
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        for i, n_layers in enumerate(self.layer_nums):
            x = nn.Conv(
                self.ds_num_filters[i], (3, 3),
                strides=(self.ds_layer_strides[i],) * 2,
                padding=1, use_bias=False, dtype=dt,
            )(x)
            x = BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x).astype(dt)
            for _ in range(n_layers):
                x = nn.Conv(
                    self.ds_num_filters[i], (3, 3), padding=1,
                    use_bias=False, dtype=dt,
                )(x)
                x = BatchNorm(use_running_average=not train)(x)
                x = nn.relu(x).astype(dt)
            j = i - upsample_start
            if j >= 0:
                stride = self.us_layer_strides[j]
                if stride > 1:
                    u = nn.ConvTranspose(
                        self.us_num_filters[j], (stride, stride),
                        strides=(stride, stride), use_bias=False, dtype=dt,
                    )(x)
                else:
                    k = int(round(1 / stride))
                    u = nn.Conv(
                        self.us_num_filters[j], (k, k), strides=(k, k),
                        use_bias=False, dtype=dt,
                    )(x)
                u = BatchNorm(use_running_average=not train)(u)
                ups.append(nn.relu(u))
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return x.astype(jnp.float32)

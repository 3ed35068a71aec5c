"""Misc exported layers.

Parity: pc_processor/layers/modules.py — `ConvUpSample` (bilinear
upsample + conv + BN + ReLU) and `CSAttention` (conv × sigmoid gate).
Exported but unused by the shipped models, kept for API completeness.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample_bilinear
from .layers import BatchNorm, Conv


class ConvUpSample(nn.Module):
    features: int
    scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_bilinear(x, self.scale)
        x = Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                 name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(
            x, use_running_average=not train)
        return nn.relu(x)


class CSAttention(nn.Module):
    """Channel-spatial attention: feature conv gated by a sigmoid mask."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        gate = Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="att_conv")(x)
        return feat * nn.sigmoid(gate)

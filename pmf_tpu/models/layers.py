"""Shared NN building blocks (flax.linen, NHWC, TPU-native layouts).

Conventions chosen for parity with the reference torch modules:
  * torch LeakyReLU default slope 0.01;
  * torch BatchNorm2d: eps 1e-5, running-stat momentum 0.1
    (flax `momentum` = 0.9);
  * torch Dropout2d: whole-channel dropout → flax Dropout with
    broadcast_dims=(1, 2) on NHWC;
  * torch AvgPool2d(count_include_pad=True): reduce_window sum / k².
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.01)


def _pad2(p) -> Sequence[tuple[int, int]]:
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class _PackedConvInner(nn.Module):
    """Holds the ORIGINAL full-res kernel params but applies the conv in
    the space-to-depth domain (ops.packed_conv). Named "Conv_0" by the
    caller so parameter paths match the unpacked nn.Conv exactly —
    checkpoints are interchangeable between packed and unpacked modes.
    """
    features: int
    kernel: tuple[int, int]
    padding: tuple[int, int]
    dilation: int
    use_bias: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, xp):
        from ..ops.packed_conv import packed_conv

        ci = xp.shape[-1] // 4
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel, ci, self.features), jnp.float32)
        y = packed_conv(xp.astype(self.dtype), k.astype(self.dtype),
                        dil=self.dilation, padding=self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + jnp.tile(b.astype(self.dtype), 4)
        return y


class Conv(nn.Module):
    """Conv2d with torch-style integer padding.

    With packed=True the input/output are space-to-depth tensors and the
    conv runs in the packed domain (same parameters, exact math) — the
    TPU-native fast path for low-channel full-resolution stages.
    """
    features: int
    kernel: tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        if self.packed:
            assert self.stride == 1, "packed conv supports stride 1 only"
            pad = self.padding if isinstance(self.padding, tuple) \
                else (self.padding, self.padding)
            return _PackedConvInner(self.features, self.kernel, pad,
                                    self.dilation, self.use_bias,
                                    self.dtype, name="Conv_0")(x)
        return nn.Conv(self.features, self.kernel,
                       strides=(self.stride, self.stride),
                       padding=_pad2(self.padding),
                       kernel_dilation=(self.dilation, self.dilation),
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class BatchNorm(nn.Module):
    """BatchNorm with torch hyperparameters.

    Under jit with a batch sharded across the data mesh axis, the batch
    statistics are global-batch statistics — XLA inserts the cross-replica
    reduction. This *is* the SyncBN the reference hand-built with thread
    pipes (pc_processor/layers/sync_bn.py:40-133).

    Mixed precision: statistics and affine run in f32 regardless of the
    activation dtype; the output is cast back to `dtype`.
    """
    use_running_average: bool | None = None
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        if self.packed:
            # statistics must pool the 4 spatial phases together to match
            # full-res per-channel BN exactly
            N, Hp, Wp, Crr = x.shape
            x5 = x.reshape(N, Hp, Wp, 4, Crr // 4)
            y = nn.BatchNorm(use_running_average=ura, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32)(x5)
            return y.reshape(N, Hp, Wp, Crr)
        # flax computes mean/var in f32 internally for half dtypes; the
        # activation stays in self.dtype (no cast round trips)
        return nn.BatchNorm(use_running_average=ura, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class Dropout2d(nn.Module):
    """Channel dropout (torch nn.Dropout2d) for NHWC tensors."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2),
                          deterministic=deterministic)(x)


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """AvgPool2d(kernel_size=3, stride=2, padding=1, count_include_pad=True).

    Parity: salsanext.py:65 pooling between encoder stages.
    """
    # scalar init (not an array) so JAX recognizes the add-monoid and the
    # op stays differentiable under jit
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / jnp.asarray(9.0, x.dtype)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """MaxPool2d(kernel_size=3, stride=2, padding=1) — the ResNet stem pool."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))

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
    # max(x, 0.01x) == LeakyReLU(0.01) elementwise. Expressed as maximum
    # (not where/select) because XLA TPU output-fuses `maximum` into a
    # convolution epilogue but schedules compare+select as a standalone
    # full-tensor pass (~13 ms/fwd of pure activation traffic at the
    # flagship eval shapes). Subgradient at exactly x == 0 is 0.505
    # (JAX splits max-tie gradients 50/50) vs 1.0 for the where/select
    # form and torch — measure-zero, but bf16 does hit exact zeros;
    # grad-parity tolerances absorb it.
    return jnp.maximum(x, x * jnp.asarray(0.01, x.dtype))


def _pad2(p) -> Sequence[tuple[int, int]]:
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


# post-activation registry for Conv(post=...): named (not callable-valued)
# so module fields stay hashable/comparable
_POST = {"leaky": leaky_relu, "relu": lambda x: jnp.maximum(x, 0)}


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
    segments: tuple | None = None
    post: str | None = None

    @nn.compact
    def __call__(self, xp, scale=None, shift=None):
        from ..ops.packed_conv import packed_conv

        ci = xp.shape[-1] // 4
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel, ci, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) if self.use_bias \
            else None
        if scale is not None:
            # folded eval-mode BN (see conv_bn): per-output-channel scale
            # on the kernel, shift folded into the bias — both O(params)
            k = k * scale[None, None, None, :]
            b = shift if b is None else b * scale + shift
        # bias + activation ride the conv epilogue (per pair conv in the
        # pair-phase decomposition — applied after the phase concat they
        # cost a standalone full-tensor pass)
        return packed_conv(xp.astype(self.dtype), k.astype(self.dtype),
                           dil=self.dilation, padding=self.padding,
                           in_segments=self.segments,
                           bias=None if b is None else b.astype(self.dtype),
                           post_fn=_POST.get(self.post))


class _DenseConvInner(nn.Module):
    """nn.Conv-compatible conv (same param names/shapes/inits under the
    caller-assigned "Conv_0" scope) that can apply a folded eval-mode
    BatchNorm: kernel scaled per output channel, shift added in the bias
    epilogue, optional fused activation. Only instantiated on the folded
    path — the unfolded path keeps nn.Conv, and the two produce identical
    parameter trees.
    """
    features: int
    kernel: tuple[int, int]
    stride: int
    padding: tuple[tuple[int, int], tuple[int, int]]
    dilation: int
    use_bias: bool
    dtype: jnp.dtype
    post: str | None = None

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        ci = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel, ci, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) if self.use_bias \
            else None
        if scale is not None:
            k = k * scale[None, None, None, :]
            b = shift if b is None else b * scale + shift
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=self.padding,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if b is not None:
            y = y + b.astype(self.dtype)
        post = _POST.get(self.post)
        return post(y) if post is not None else y


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
    packed_segments: tuple | None = None  # input packed-channel layout
                                          # (see ops.packed_conv)
    post: str | None = None  # fused post-activation ("leaky")

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        if self.packed:
            assert self.stride == 1, "packed conv supports stride 1 only"
            pad = self.padding if isinstance(self.padding, tuple) \
                else (self.padding, self.padding)
            return _PackedConvInner(self.features, self.kernel, pad,
                                    self.dilation, self.use_bias,
                                    self.dtype, self.packed_segments,
                                    self.post, name="Conv_0")(x, scale, shift)
        if scale is not None:
            # folded eval-mode BN path (conv_bn): needs raw kernel access,
            # so a param-compatible inner conv replaces nn.Conv
            return _DenseConvInner(self.features, self.kernel, self.stride,
                                   _pad2(self.padding), self.dilation,
                                   self.use_bias, self.dtype, self.post,
                                   name="Conv_0")(x, scale, shift)
        y = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=_pad2(self.padding),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        post = _POST.get(self.post)
        return post(y) if post is not None else y


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
    def __call__(self, x, use_running_average: bool | None = None,
                 fold: int | None = None):
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        if fold is not None:
            # running-stat coefficient extraction for conv_bn folding:
            # declare the exact same params/stats and return (a, b) f32
            # with y = x·a + b ≡ BN(x). `fold` carries the channel count
            # (x is not passed).
            assert ura, "BN folding is an eval-time (running-stat) rewrite"
            cls = _PackedBatchNorm if self.packed else _DenseBatchNorm
            return cls(dtype=self.dtype, name="BatchNorm_0")(
                None, True, fold=fold)
        if self.packed:
            # statistics pool the 4 spatial phases to match full-res
            # per-channel BN exactly. The DATA stays 4D: only the [4C]
            # reduced moments are reshaped, and the affine runs as one
            # fused multiply-add with phase-tiled coefficients — the 5D
            # round trip this replaces cost a layout copy of the whole
            # tensor on TPU at every BN call.
            return _PackedBatchNorm(dtype=self.dtype, name="BatchNorm_0")(
                x, ura)
        # same math/params as nn.BatchNorm(momentum=0.9, eps=1e-5), but the
        # affine is applied as x·a + b with a, b reduced to self.dtype —
        # at eval a, b are constants, so the whole BN fuses into the
        # producing conv's epilogue instead of costing an f32
        # multiply+convert pass over the full tensor (~18 ms/fwd at the
        # flagship eval shapes). Child name matches nn.BatchNorm's
        # auto-name so checkpoints are interchangeable.
        return _DenseBatchNorm(dtype=self.dtype, name="BatchNorm_0")(x, ura)


class _DenseBatchNorm(nn.Module):
    """BatchNorm2d with torch hyperparameters (eps 1e-5, running momentum
    0.1) storing f32 params/stats under the same names as nn.BatchNorm.

    Statistics are computed in f32 (fast-variance form E[x²]−E[x]², as
    flax does); the affine y = x·a + b runs in `dtype` with a = γ/σ and
    b = β − μ·a folded to two [C] vectors first — algebraically identical
    to (x−μ)/σ·γ+β, and in eval mode a pure fusable multiply-add.
    """
    dtype: jnp.dtype = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool, fold: int | None = None):
        C = x.shape[-1] if fold is None else fold
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(0, 1, 2))
            var = (xf * xf).mean(axis=(0, 1, 2)) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        if fold is not None:
            return inv, bias - mean * inv
        a = inv.astype(self.dtype)
        b = (bias - mean * inv).astype(self.dtype)
        return x.astype(self.dtype) * a + b


class _PackedBatchNorm(nn.Module):
    """BatchNorm over a space-to-depth tensor [N, Hp, Wp, 4C] with
    phase-pooled statistics — numerically the full-resolution per-channel
    BN (torch hyperparameters: eps 1e-5, running momentum 0.1).

    Parameter/stat shapes are [C], identical to the unpacked
    nn.BatchNorm, so checkpoints stay interchangeable between modes.
    """
    dtype: jnp.dtype = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool, fold: int | None = None):
        C = x.shape[-1] // 4 if fold is None else fold
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            # per-packed-channel first/second moments [4C], then pool the
            # 4 phases — only these tiny vectors get reshaped
            m1 = xf.mean(axis=(0, 1, 2))
            m2 = (xf * xf).mean(axis=(0, 1, 2))
            mean = m1.reshape(4, C).mean(0)
            var = m2.reshape(4, C).mean(0) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        if fold is not None:
            # [C] coefficients — the packed conv tiles its bias across the
            # 4 phases itself, and the kernel's co axis is unphased
            return inv, bias - mean * inv
        a = jnp.tile(inv, 4).astype(self.dtype)
        b = jnp.tile(bias - mean * inv, 4).astype(self.dtype)
        return x.astype(self.dtype) * a + b


# Eval-mode BN folding switch. The fold is algebraically exact, but it
# perturbs which conv codegen strategy XLA picks per program: an H-axis
# spatially-sharded eval forward then differs from the unsharded one by
# float accumulation noise (measured ≤ 8.4e-4 abs on f32 softmax
# outputs, 99.6% identical argmax on random weights; with the fold
# disabled the two programs agree to 4.5e-8 — bisected round 4, see
# tests/test_parallel.py). Flip off to trade the ~36 fused BN passes for
# bitwise-stable cross-sharding numerics (debugging / parity hunts).
FOLD_EVAL_BN = True


def conv_bn(x, *, features, kernel=(3, 3), stride=1, padding=0, dilation=1,
            use_bias=False, dtype=jnp.float32, packed=False,
            packed_segments=None, act: str | None = None,
            conv_name: str, bn_name: str, train: bool):
    """Conv → BatchNorm [→ act] with the BN folded into the conv at eval.

    Train mode runs the plain three-op chain (batch statistics need the
    conv output). Eval mode rewrites it exactly: with a = γ/√(σ²+ε) and
    b = β − μ·a from the running stats, BN(conv_k(x) + cb) ≡
    conv_{k·a}(x) + (cb·a + b) — a per-output-channel kernel scale costing
    O(params), after which the activation rides the conv epilogue and the
    BN's full-tensor HBM pass disappears (~1 ms each at the flagship
    384×1232 eval shapes, ×36 BNs in ResNet34).

    Must be called from inside an @nn.compact __call__ — the Conv/BN
    children attach to the caller's scope under `conv_name`/`bn_name`,
    producing the identical parameter tree in both modes (checkpoints
    interchangeable, torch_convert untouched).
    """
    if train or not FOLD_EVAL_BN:
        y = Conv(features, kernel, stride=stride, padding=padding,
                 dilation=dilation, use_bias=use_bias, dtype=dtype,
                 packed=packed, packed_segments=packed_segments,
                 name=conv_name)(x)
        y = BatchNorm(dtype=dtype, packed=packed, name=bn_name)(
            y, use_running_average=not train)
        post = _POST.get(act)
        return post(y) if post is not None else y
    a, b = BatchNorm(dtype=dtype, packed=packed, name=bn_name)(
        None, use_running_average=True, fold=features)
    return Conv(features, kernel, stride=stride, padding=padding,
                dilation=dilation, use_bias=use_bias, dtype=dtype,
                packed=packed, packed_segments=packed_segments, post=act,
                name=conv_name)(x, a, b)


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

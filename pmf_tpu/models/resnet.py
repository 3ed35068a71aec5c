"""ResNet camera encoder (flax, NHWC).

Parity: pc_processor/models/pmf_net.py:41-100 (ResNet wrapper around
torchvision resnet34/50/101/152) with the PMF modifications:
  * stem conv is 7×7 **stride 1** (only the maxpool downsamples before
    layer1, so layer1 sits at 1/2 input resolution — pmf_net.py:69-72);
  * channel dropout after layer3 and layer4 outputs;
  * forward returns the four stage outputs [layer1..layer4]
    (strides 2, 4, 8, 16).

Weights can be loaded from a converted torchvision state_dict
(pmf_tpu.models.torch_convert) to reproduce ImageNet pretraining.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.packed_conv import packed_max_pool_3x3_s2, space_to_depth
from .layers import Dropout2d, conv_bn, max_pool_3x3_s2

_STAGES = {
    "resnet34": ([3, 4, 6, 3], "basic", 1),
    "resnet50": ([3, 4, 6, 3], "bottleneck", 4),
    "resnet101": ([3, 4, 23, 3], "bottleneck", 4),
    "resnet152": ([3, 8, 36, 3], "bottleneck", 4),
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        identity = x
        out = conv_bn(x, features=self.features, kernel=(3, 3),
                      stride=self.stride, padding=1, dtype=dt, act="relu",
                      conv_name="conv1", bn_name="bn1", train=train)
        if not train:
            # eval only: keep XLA from fusing conv2 over conv1 (a fused
            # conv chain recomputes the producer per consumer tap —
            # measured 3-6x cost). Under grad the barrier instead blocks
            # backward-pass scheduling (train step measured 2x SLOWER
            # with it), and the autodiff graph never forms conv chains.
            out = jax.lax.optimization_barrier(out)
        out = conv_bn(out, features=self.features, kernel=(3, 3), padding=1,
                      dtype=dt, conv_name="conv2", bn_name="bn2", train=train)
        if self.downsample:
            identity = conv_bn(x, features=self.features, kernel=(1, 1),
                               stride=self.stride, dtype=dt,
                               conv_name="downsample_conv",
                               bn_name="downsample_bn", train=train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output = features * 4
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        identity = x
        out = conv_bn(x, features=self.features, kernel=(1, 1), dtype=dt,
                      act="relu", conv_name="conv1", bn_name="bn1", train=train)
        out = conv_bn(out, features=self.features, kernel=(3, 3),
                      stride=self.stride, padding=1, dtype=dt, act="relu",
                      conv_name="conv2", bn_name="bn2", train=train)
        out = conv_bn(out, features=self.features * 4, kernel=(1, 1),
                      dtype=dt, conv_name="conv3", bn_name="bn3", train=train)
        if self.downsample:
            identity = conv_bn(x, features=self.features * 4, kernel=(1, 1),
                               stride=self.stride, dtype=dt,
                               conv_name="downsample_conv",
                               bn_name="downsample_bn", train=train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """4-stage feature extractor; returns [c1, c2, c3, c4]."""
    backbone: str = "resnet34"
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32
    packed_stem: bool = False  # run the stride-1 7x7 stem in the
                               # space-to-depth domain (exact, faster)

    @property
    def expansion(self) -> int:
        return _STAGES[self.backbone][2]

    @property
    def feature_channels(self):
        e = self.expansion
        return [64 * e, 128 * e, 256 * e, 512 * e]

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks, kind, _ = _STAGES[self.backbone]
        block_cls = BasicBlock if kind == "basic" else Bottleneck

        h, w = x.shape[1], x.shape[2]
        if h % 16 != 0 or w % 16 != 0:
            raise ValueError(f"invalid input size: {x.shape}")

        x = x.astype(self.dtype)
        # stem: 7x7 stride-1 conv (PMF trick), BN, relu, 3x3/2 maxpool
        if self.packed_stem:
            xp = space_to_depth(x)
            out = conv_bn(xp, features=64, kernel=(7, 7), padding=3,
                          dtype=self.dtype, packed=True, act="relu",
                          conv_name="conv1", bn_name="bn1", train=train)
            out = packed_max_pool_3x3_s2(out, 64)
            if not train:
                out = jax.lax.optimization_barrier(out)
        else:
            out = conv_bn(x, features=64, kernel=(7, 7), padding=3,
                          dtype=self.dtype, act="relu",
                          conv_name="conv1", bn_name="bn1", train=train)
            out = max_pool_3x3_s2(out)

        feats = []
        widths = [64, 128, 256, 512]
        for stage, (n, width) in enumerate(zip(blocks, widths)):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                expansion = 1 if kind == "basic" else 4
                needs_ds = (i == 0) and (
                    stride != 1 or (stage == 0 and kind == "bottleneck"))
                out = block_cls(width, stride=stride, downsample=needs_ds,
                                dtype=self.dtype,
                                name=f"layer{stage + 1}_{i}")(out, train)
            feats.append(out)

        # dropout on layer3/layer4 outputs (pmf_net.py:97-98)
        feats[2] = Dropout2d(self.dropout_rate, name="dropout3")(
            feats[2], deterministic=not train)
        feats[3] = Dropout2d(self.dropout_rate, name="dropout4")(
            feats[3], deterministic=not train)
        return feats

"""SalsaNext range-image encoder-decoder (flax, NHWC).

Parity: pc_processor/models/salsanext.py (block graph preserved exactly:
3×ResContextBlock → 5×ResBlock (avg-pool downsample, dilated multi-branch
with concat-1×1 merge) → 4×UpBlock (PixelShuffle ×2 + skip concat) → 1×1
logits + softmax). Channel widths: base 32, encoder 32/64/128/256/256.

TPU-native notes: NHWC keeps convs MXU-aligned; dropout is channelwise;
BatchNorm here gives SyncBN semantics under a sharded global batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.packed_conv import packed_avg_pool_3x3_s2
from ..ops.resize import pixel_shuffle
from .layers import BatchNorm, Conv, Dropout2d, avg_pool_3x3_s2


class ResContextBlock(nn.Module):
    """1×1 shortcut + (3×3 → 3×3 dil2) residual context block.

    Parity: salsanext.py:9-36 (note act→BN ordering).
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        dt, pk = self.dtype, self.packed
        shortcut = Conv(self.features, (1, 1), dtype=dt, packed=pk,
                        post="leaky", name="conv1")(x)
        resA = Conv(self.features, (3, 3), padding=1, dtype=dt,
                    packed=pk, post="leaky", name="conv2")(shortcut)
        resA1 = BatchNorm(dtype=dt, packed=pk, name="bn1")(
            resA, use_running_average=not train)
        resA = Conv(self.features, (3, 3), padding=2, dilation=2,
                    dtype=dt, packed=pk, post="leaky", name="conv3")(resA1)
        resA2 = BatchNorm(dtype=dt, packed=pk, name="bn2")(
            resA, use_running_average=not train)
        return shortcut + resA2


class ResBlock(nn.Module):
    """Dilated multi-branch residual block with optional pooling.

    Parity: salsanext.py:38-104. Returns (pooled, pre-pool skip) when
    pooling else the block output.
    """
    features: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False   # packed in/out (skip); pooled output unpacked

    @nn.compact
    def __call__(self, x, train: bool):
        dt, pk = self.dtype, self.packed
        shortcut = Conv(self.features, (1, 1), dtype=dt, packed=pk,
                        post="leaky", name="conv1")(x)
        resA = Conv(self.features, (3, 3), padding=1, dtype=dt,
                    packed=pk, post="leaky", name="conv2")(x)
        resA1 = BatchNorm(dtype=dt, packed=pk, name="bn1")(
            resA, use_running_average=not train)
        resA = Conv(self.features, (3, 3), padding=2, dilation=2,
                    dtype=dt, packed=pk, post="leaky", name="conv3")(resA1)
        resA2 = BatchNorm(dtype=dt, packed=pk, name="bn2")(
            resA, use_running_average=not train)
        resA = Conv(self.features, (2, 2), padding=1, dilation=2,
                    dtype=dt, packed=pk, post="leaky", name="conv4")(resA2)
        resA3 = BatchNorm(dtype=dt, packed=pk, name="bn3")(
            resA, use_running_average=not train)
        # packed mode: plain channel concat; conv5 absorbs the resulting
        # three-phase-block layout into its packed kernel (zero reorder)
        concat = jnp.concatenate([resA1, resA2, resA3], -1)
        segs = (("p", self.features),) * 3 if pk else None
        resA = Conv(self.features, (1, 1), dtype=dt, packed=pk,
                    packed_segments=segs, post="leaky",
                    name="conv5")(concat)
        resA = BatchNorm(dtype=dt, packed=pk, name="bn4")(
            resA, use_running_average=not train)
        resA = shortcut + resA

        resB = resA
        if self.drop_out:
            assert not pk, "dropout inside packed blocks is not supported"
            resB = Dropout2d(self.dropout_rate, name="dropout")(resB, deterministic=not train)
        if self.pooling:
            pool = (lambda t: packed_avg_pool_3x3_s2(t, self.features)) \
                if pk else avg_pool_3x3_s2
            return pool(resB), resA
        return resB


class UpBlock(nn.Module):
    """PixelShuffle ×2 upsample + skip concat + dilated multi-branch merge.

    Parity: salsanext.py:107-164.
    """
    features: int
    dropout_rate: float = 0.2
    drop_out: bool = True
    dtype: jnp.dtype = jnp.float32
    packed: bool = False   # x unpacked half-res; skip + output packed

    @nn.compact
    def __call__(self, x, skip, train: bool):
        dt, pk = self.dtype, self.packed
        det = not train
        if pk:
            assert not self.drop_out, \
                "dropout inside packed blocks is not supported"
            # x (unpacked half-res, PixelShuffle-bound) IS the packed
            # full-res upsample viewed channel-major — no data movement;
            # conv1's packed kernel absorbs both layouts
            upB = jnp.concatenate([x.astype(dt), skip], axis=-1)
            segs1 = (("c", x.shape[-1] // 4), ("p", skip.shape[-1] // 4))
        else:
            upA = pixel_shuffle(x, 2)
            if self.drop_out:
                upA = Dropout2d(self.dropout_rate, name="dropout1")(upA, deterministic=det)
            upB = jnp.concatenate([upA, skip], axis=-1)
            if self.drop_out:
                upB = Dropout2d(self.dropout_rate, name="dropout2")(upB, deterministic=det)
            segs1 = None

        upE = Conv(self.features, (3, 3), padding=1, dtype=dt,
                   packed=pk, packed_segments=segs1, post="leaky",
                   name="conv1")(upB)
        upE1 = BatchNorm(dtype=dt, packed=pk, name="bn1")(
            upE, use_running_average=not train)
        upE = Conv(self.features, (3, 3), padding=2, dilation=2,
                   dtype=dt, packed=pk, post="leaky", name="conv2")(upE1)
        upE2 = BatchNorm(dtype=dt, packed=pk, name="bn2")(
            upE, use_running_average=not train)
        upE = Conv(self.features, (2, 2), padding=1, dilation=2,
                   dtype=dt, packed=pk, post="leaky", name="conv3")(upE2)
        upE3 = BatchNorm(dtype=dt, packed=pk, name="bn3")(
            upE, use_running_average=not train)
        concat = jnp.concatenate([upE1, upE2, upE3], -1)
        segs4 = (("p", self.features),) * 3 if pk else None
        upE = Conv(self.features, (1, 1), dtype=dt, packed=pk,
                   packed_segments=segs4, post="leaky",
                   name="conv4")(concat)
        upE = BatchNorm(dtype=dt, packed=pk, name="bn4")(
            upE, use_running_average=not train)
        if self.drop_out and not pk:
            upE = Dropout2d(self.dropout_rate, name="dropout3")(upE, deterministic=det)
        return upE


class SalsaNext(nn.Module):
    """LiDAR-only SalsaNext. Parity: salsanext.py:166-208.

    Input [N, H, W, C_in]; output per-pixel class probabilities
    [N, H, W, nclasses] (softmax=True) or logits.
    """
    nclasses: int = 20
    base_channels: int = 32
    softmax: bool = True
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        bc = self.base_channels
        dt = self.dtype
        self.downCntx = ResContextBlock(bc, dtype=dt)
        self.downCntx2 = ResContextBlock(bc, dtype=dt)
        self.downCntx3 = ResContextBlock(bc, dtype=dt)
        self.resBlock1 = ResBlock(2 * bc, self.dropout_rate, pooling=True,
                                  drop_out=False, dtype=dt)
        self.resBlock2 = ResBlock(4 * bc, self.dropout_rate, pooling=True, dtype=dt)
        self.resBlock3 = ResBlock(8 * bc, self.dropout_rate, pooling=True, dtype=dt)
        self.resBlock4 = ResBlock(8 * bc, self.dropout_rate, pooling=True, dtype=dt)
        self.resBlock5 = ResBlock(8 * bc, self.dropout_rate, pooling=False, dtype=dt)
        self.upBlock1 = UpBlock(4 * bc, self.dropout_rate, dtype=dt)
        self.upBlock2 = UpBlock(4 * bc, self.dropout_rate, dtype=dt)
        self.upBlock3 = UpBlock(2 * bc, self.dropout_rate, dtype=dt)
        self.upBlock4 = UpBlock(bc, self.dropout_rate, drop_out=False, dtype=dt)
        self.logits = Conv(self.nclasses, (1, 1), dtype=dt, name="logits")

    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        c = self.downCntx(x, train)
        c = self.downCntx2(c, train)
        c = self.downCntx3(c, train)

        down0c, down0b = self.resBlock1(c, train)
        down1c, down1b = self.resBlock2(down0c, train)
        down2c, down2b = self.resBlock3(down1c, train)
        down3c, down3b = self.resBlock4(down2c, train)
        down5c = self.resBlock5(down3c, train)

        up4e = self.upBlock1(down5c, down3b, train)
        up3e = self.upBlock2(up4e, down2b, train)
        up2e = self.upBlock3(up3e, down1b, train)
        up1e = self.upBlock4(up2e, down0b, train)
        logits = self.logits(up1e).astype(jnp.float32)
        if self.softmax:
            return jax.nn.softmax(logits, axis=-1)
        return logits

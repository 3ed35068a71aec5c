"""EPMFNet: the efficient PMF variant (TPAMI 2024 extension).

Parity: pc_processor/models/epmf_net.py —
  * SparseVariantConv (:10-50): conv on mask-zeroed input, extra bias,
    output multiplied by the max-pool-dilated mask. NOTE the reference
    computes a 1/count normalizer and never applies it (epmf_net.py:40,
    dead code); we reproduce the *executed* semantics.
  * sparse ResContextBlock (:52-80): mask recomputed from |x| per block,
    stride-2 support, output re-masked.
  * SalsaNextFusion (:82-131): downCntx3 stride 2 (lidar stream at half
    resolution), fusion BEFORE each resBlock at widths bc·{1,2,4,8},
    ASPP bottleneck, extraUpSample (conv+PixelShuffle) recovering full
    resolution; returns (probs, bottleneck).
  * RGBDecoder (:134-183): camera decoder ingesting ASPP(img4) ⊕
    upsampled lidar bottleneck — bidirectional fusion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import pixel_shuffle, upsample_bilinear
from .layers import BatchNorm, Conv, leaky_relu
from .pmf import ASPP, ResidualBasedFusionBlock
from .resnet import ResNetEncoder
from .salsanext import ResBlock, UpBlock


def _dilate_mask(mask: jax.Array, kernel: int, stride: int, dilation: int,
                 padding: tuple[int, int]) -> jax.Array:
    """Max-pool mask dilation matching SparseVariantConv (epmf_net.py:42-43):
    pad with zeros by the conv padding, then MaxPool(kernel, stride,
    padding=0, dilation)."""
    ph, pw = padding
    m = jnp.pad(mask, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    # stop_gradient: the mask chain starts at a comparison (zero grad),
    # so detaching is mathematically exact — and without it autodiff
    # emits a SelectAndScatter (max-pool VJP) per SparseVariantConv,
    # which made the EPMF train-step compile run >25 min at 320×1216
    # (torch reaches the same dead end through maxpool backward; the
    # grad dies at the comparison either way)
    return jax.lax.stop_gradient(jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        window_dilation=(1, dilation, dilation, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0))))


class SparseVariantConv(nn.Module):
    """Sparsity-aware conv: zeroes invalid pixels, dilates the mask.

    Parity: epmf_net.py:10-50. The torch module carries both the Conv2d's
    own bias and an extra explicit bias parameter; both are reproduced.
    """
    features: int
    kernel: int = 3
    padding: int = 1
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        x = x * mask
        new_mask = _dilate_mask(mask, self.kernel, self.stride, self.dilation,
                                (self.padding, self.padding))
        y = Conv(self.features, (self.kernel, self.kernel), stride=self.stride,
                 padding=self.padding, dilation=self.dilation,
                 dtype=self.dtype, name="conv")(x)
        extra_bias = self.param("bias", nn.initializers.zeros,
                                (self.features,), jnp.float32)
        y = y + extra_bias
        return y * new_mask, new_mask


class SparseResContextBlock(nn.Module):
    """Sparse context block. Parity: epmf_net.py:52-80."""
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        x = x.astype(dt)
        mask = (jnp.abs(x).sum(axis=-1, keepdims=True) != 0).astype(x.dtype)
        shortcut, mask = SparseVariantConv(self.features, 3, padding=1,
                                           stride=self.stride, dtype=dt,
                                           name="conv1")(x, mask)
        shortcut = leaky_relu(shortcut)
        resA, mask = SparseVariantConv(self.features, 3, padding=1, dtype=dt,
                                       name="conv2")(shortcut, mask)
        resA1 = BatchNorm(dtype=dt, name="bn1")(leaky_relu(resA),
                                                use_running_average=not train)
        resA, mask = SparseVariantConv(self.features, 3, padding=2, dilation=2,
                                       dtype=dt, name="conv3")(resA1, mask)
        resA2 = BatchNorm(dtype=dt, name="bn2")(leaky_relu(resA),
                                                use_running_average=not train)
        return (shortcut + resA2) * mask


class ExtraUpSample(nn.Module):
    """conv → LReLU → BN → PixelShuffle(2). Parity: epmf_net.py:97-102.

    keep_packed: skip the PixelShuffle and return the half-res tensor
    as-is — it IS the packed full-res result in channel-major phase
    order, which a downstream packed conv consumes with zero data
    movement (ops.packed_conv segment ("c", C/4))."""
    conv_features: int
    dtype: jnp.dtype = jnp.float32
    keep_packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.conv_features, (3, 3), padding=1, dtype=self.dtype,
                 name="conv")(x)
        x = leaky_relu(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        if self.keep_packed:
            return x
        return pixel_shuffle(x, 2)


class SalsaNextFusionV2(nn.Module):
    """EPMF lidar stream. Parity: epmf_net.py:82-131.

    use_packed: the extraUpSample→logits tail runs in the space-to-depth
    domain (exact) — the PixelShuffle becomes a zero-op channel
    reinterpretation consumed by a packed 1×1 logits conv."""
    nclasses: int = 20
    base_channels: int = 32
    dropout_rate: float = 0.2
    softmax: bool = True
    dtype: jnp.dtype = jnp.float32
    use_packed: bool = False

    @nn.compact
    def __call__(self, x, img_features, train: bool = False):
        bc = self.base_channels
        dt = self.dtype
        c = SparseResContextBlock(bc, dtype=dt, name="downCntx")(x, train)
        c = SparseResContextBlock(bc, dtype=dt, name="downCntx2")(c, train)
        c = SparseResContextBlock(bc, stride=2, dtype=dt, name="downCntx3")(c, train)

        c = ResidualBasedFusionBlock(bc, dtype=dt, name="fusionblock_1")(
            c, img_features[0], train)
        down0c, down0b = ResBlock(2 * bc, self.dropout_rate, pooling=True,
                                  drop_out=False, dtype=dt,
                                  name="resBlock1")(c, train)

        down0c = ResidualBasedFusionBlock(2 * bc, dtype=dt, name="fusionblock_2")(
            down0c, img_features[1], train)
        down1c, down1b = ResBlock(4 * bc, self.dropout_rate, dtype=dt,
                                  name="resBlock2")(down0c, train)

        down1c = ResidualBasedFusionBlock(4 * bc, dtype=dt, name="fusionblock_3")(
            down1c, img_features[2], train)
        down2c, down2b = ResBlock(8 * bc, self.dropout_rate, dtype=dt,
                                  name="resBlock3")(down1c, train)

        down2c = ResidualBasedFusionBlock(8 * bc, dtype=dt, name="fusionblock_4")(
            down2c, img_features[3], train)
        down3c, down3b = ResBlock(8 * bc, self.dropout_rate, dtype=dt,
                                  name="resBlock4")(down2c, train)

        down5c = ResBlock(8 * bc, self.dropout_rate, pooling=False, dtype=dt,
                          name="resBlock5")(down3c, train)
        down5c = ASPP(8 * bc, dtype=dt, name="aspp")(down5c)

        up4e = UpBlock(4 * bc, self.dropout_rate, dtype=dt,
                       name="upBlock1")(down5c, down3b, train)
        up3e = UpBlock(4 * bc, self.dropout_rate, dtype=dt,
                       name="upBlock2")(up4e, down2b, train)
        up2e = UpBlock(2 * bc, self.dropout_rate, dtype=dt,
                       name="upBlock3")(up3e, down1b, train)
        up1e = UpBlock(bc, self.dropout_rate, drop_out=False, dtype=dt,
                       name="upBlock4")(up2e, down0b, train)
        up1e = ExtraUpSample(4 * bc, dtype=dt, keep_packed=self.use_packed,
                             name="extraUpSample")(up1e, train)
        if self.use_packed:
            from ..ops.packed_conv import depth_to_space

            logits = Conv(self.nclasses, (1, 1), dtype=dt, packed=True,
                          packed_segments=(("c", bc),),
                          name="logits")(up1e)
            logits = depth_to_space(logits).astype(jnp.float32)
        else:
            logits = Conv(self.nclasses, (1, 1), dtype=dt,
                          name="logits")(up1e).astype(jnp.float32)
        if self.softmax:
            return jax.nn.softmax(logits, axis=-1), down5c
        return logits, down5c


class RGBDecoderV2(nn.Module):
    """Camera decoder with reverse (lidar→camera) fusion.

    Parity: epmf_net.py:134-183.
    """
    nclasses: int = 20
    base_channels: int = 64
    lidar_base_channels: int = 32
    aspp_depth: int = 512  # = in_channels[3] of the encoder
    dtype: jnp.dtype = jnp.float32
    use_packed: bool = False

    @nn.compact
    def __call__(self, inputs, lidar_feature, train: bool = False):
        dt = self.dtype
        lbc = self.lidar_base_channels
        lid = ExtraUpSample(8 * lbc, dtype=dt, name="extraUpSample")(lidar_feature, train)
        img4 = ASPP(self.aspp_depth, dtype=dt, name="aspp")(inputs[3])
        fuse = jnp.concatenate([lid, img4.astype(lid.dtype)], axis=-1)

        def up_stage(x, name, kernel=(3, 3), padding=1, upsample=True):
            x = Conv(self.base_channels, kernel, padding=padding, dtype=dt,
                     name=f"{name}_conv")(x)
            x = leaky_relu(x)
            x = BatchNorm(dtype=dt, name=f"{name}_bn")(x, use_running_average=not train)
            return upsample_bilinear(x, 2) if upsample else x

        up4 = up_stage(fuse, "up_4a")
        up3 = up_stage(jnp.concatenate([up4, inputs[2]], -1), "up_3a")
        up2 = up_stage(jnp.concatenate([up3, inputs[1]], -1), "up_2a")
        up1 = up_stage(jnp.concatenate([up2, inputs[0]], -1), "up_1a",
                       kernel=(1, 1), padding=0,
                       upsample=not self.use_packed)
        if self.use_packed:
            from ..ops.packed_conv import depth_to_space
            from ..ops.resize import upsample_bilinear_x2_packed

            up1p = upsample_bilinear_x2_packed(up1)
            out = Conv(self.nclasses, (3, 3), padding=1, dtype=dt,
                       packed=True, name="conv")(up1p)
            out = depth_to_space(out).astype(jnp.float32)
        else:
            out = Conv(self.nclasses, (3, 3), padding=1, dtype=dt,
                       name="conv")(up1).astype(jnp.float32)
        return jax.nn.softmax(out, axis=-1)


class EPMFNet(nn.Module):
    """Efficient PMF. Parity: epmf_net.py:185-216.

    Input must be divisible by 64 (half-res lidar stream × 5 pools);
    forward(pcd [N,H,W,5], img [N,H,W,3]) → (lidar_probs, camera_probs).
    """
    nclasses: int = 20
    base_channels: int = 32
    image_backbone: str = "resnet34"
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32
    use_packed: bool = False

    def setup(self):
        self.camera_stream_encoder = ResNetEncoder(
            backbone=self.image_backbone, dropout_rate=self.dropout_rate,
            dtype=self.dtype, packed_stem=self.use_packed)
        self.camera_stream_decoder = RGBDecoderV2(
            nclasses=self.nclasses,
            base_channels=self.camera_stream_encoder.expansion * 16,
            lidar_base_channels=self.base_channels,
            aspp_depth=self.camera_stream_encoder.feature_channels[3],
            dtype=self.dtype, use_packed=self.use_packed)
        self.lidar_stream = SalsaNextFusionV2(
            nclasses=self.nclasses, base_channels=self.base_channels,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            use_packed=self.use_packed)

    def __call__(self, pcd_feature, img_feature, train: bool = False):
        img_feats = self.camera_stream_encoder(img_feature, train)
        lidar_pred, lidar_feature = self.lidar_stream(pcd_feature, img_feats, train)
        camera_pred = self.camera_stream_decoder(img_feats, lidar_feature, train)
        return lidar_pred, camera_pred

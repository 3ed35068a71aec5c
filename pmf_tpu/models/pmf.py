"""PMFNet: two-stream perception-aware multi-sensor fusion network.

Parity: pc_processor/models/pmf_net.py —
  * ResidualBasedFusionBlock (:10-36): concat → conv/LReLU/BN, sigmoid
    attention (conv/BN/ReLU/conv/BN/sigmoid), residual add;
  * ASPP (:103-138): global-pool branch + 1×1 + three dilated 3×3
    (6/12/18), 1×1 merge;
  * SalsaNextFusion (:141-180): SalsaNext encoder with a fusion block
    after each of resBlocks 1-4 ingesting the matching ResNet stage,
    ASPP on the bottleneck before the decoder;
  * RGBDecoder (:183-222): 4-stage conv+bilinear-upsample FCN + softmax;
  * PMFNet (:224-249): returns (lidar_probs, camera_probs), channel-last.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.packed_conv import depth_to_space, space_to_depth
from ..ops.resize import upsample_bilinear, upsample_bilinear_x2_packed
from .layers import BatchNorm, Conv, conv_bn, leaky_relu
from .resnet import ResNetEncoder
from .salsanext import ResBlock, ResContextBlock, UpBlock


class ResidualBasedFusionBlock(nn.Module):
    """Attention-gated residual fusion of camera features into the lidar
    stream. Parity: pmf_net.py:10-36."""
    pcd_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pcd_feature, img_feature, train: bool):
        dt = self.dtype
        cat = jnp.concatenate([pcd_feature, img_feature.astype(pcd_feature.dtype)],
                              axis=-1)
        fused = Conv(self.pcd_channels, (3, 3), padding=1, dtype=dt,
                     name="fuse_conv")(cat)
        fused = leaky_relu(fused)
        fused = BatchNorm(dtype=dt, name="fuse_bn")(fused, use_running_average=not train)

        att = conv_bn(fused, features=self.pcd_channels, kernel=(3, 3),
                      padding=1, use_bias=True, dtype=dt, act="relu",
                      conv_name="att_conv1", bn_name="att_bn1", train=train)
        att = conv_bn(att, features=self.pcd_channels, kernel=(3, 3),
                      padding=1, use_bias=True, dtype=dt,
                      conv_name="att_conv2", bn_name="att_bn2", train=train)
        att = nn.sigmoid(att)
        return fused * att + pcd_feature


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling. Parity: pmf_net.py:103-138."""
    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        gp = x.mean(axis=(1, 2), keepdims=True)
        gp = Conv(self.depth, (1, 1), dtype=dt, name="conv")(gp)
        gp = jnp.broadcast_to(gp, (x.shape[0], h, w, self.depth))

        b1 = Conv(self.depth, (1, 1), dtype=dt, name="atrous_block1")(x)
        b6 = Conv(self.depth, (3, 3), padding=6, dilation=6, dtype=dt,
                  name="atrous_block6")(x)
        b12 = Conv(self.depth, (3, 3), padding=12, dilation=12, dtype=dt,
                   name="atrous_block12")(x)
        b18 = Conv(self.depth, (3, 3), padding=18, dilation=18, dtype=dt,
                   name="atrous_block18")(x)
        cat = jnp.concatenate([gp, b1, b6, b12, b18], axis=-1)
        return Conv(self.depth, (1, 1), dtype=dt, name="conv_1x1_output")(cat)


class SalsaNextFusion(nn.Module):
    """SalsaNext lidar stream with per-stage camera fusion + ASPP.

    Parity: pmf_net.py:141-180 (fusion AFTER each resBlock — contrast
    EPMF which fuses before).
    """
    nclasses: int = 20
    base_channels: int = 32
    dropout_rate: float = 0.2
    softmax: bool = True
    dtype: jnp.dtype = jnp.float32
    use_packed: bool = False  # run full-res stages in the
                              # space-to-depth domain (exact, ~TPU 2x)

    @nn.compact
    def __call__(self, x, img_features, train: bool = False):
        bc = self.base_channels
        dt, pk = self.dtype, self.use_packed
        x = x.astype(dt)
        if pk:
            x = space_to_depth(x)
        c = ResContextBlock(bc, dtype=dt, packed=pk, name="downCntx")(x, train)
        c = ResContextBlock(bc, dtype=dt, packed=pk, name="downCntx2")(c, train)
        c = ResContextBlock(bc, dtype=dt, packed=pk, name="downCntx3")(c, train)

        down0c, down0b = ResBlock(2 * bc, self.dropout_rate, pooling=True,
                                  drop_out=False, dtype=dt, packed=pk,
                                  name="resBlock1")(c, train)
        down0c = ResidualBasedFusionBlock(2 * bc, dtype=dt, name="fusionblock_1")(
            down0c, img_features[0], train)

        down1c, down1b = ResBlock(4 * bc, self.dropout_rate, dtype=dt,
                                  name="resBlock2")(down0c, train)
        down1c = ResidualBasedFusionBlock(4 * bc, dtype=dt, name="fusionblock_2")(
            down1c, img_features[1], train)

        down2c, down2b = ResBlock(8 * bc, self.dropout_rate, dtype=dt,
                                  name="resBlock3")(down1c, train)
        down2c = ResidualBasedFusionBlock(8 * bc, dtype=dt, name="fusionblock_3")(
            down2c, img_features[2], train)

        down3c, down3b = ResBlock(8 * bc, self.dropout_rate, dtype=dt,
                                  name="resBlock4")(down2c, train)
        down3c = ResidualBasedFusionBlock(8 * bc, dtype=dt, name="fusionblock_4")(
            down3c, img_features[3], train)

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
                       packed=pk, name="upBlock4")(up2e, down0b, train)
        logits = Conv(self.nclasses, (1, 1), dtype=dt, packed=pk,
                      name="logits")(up1e)
        if pk:
            logits = depth_to_space(logits)
        logits = logits.astype(jnp.float32)
        if self.softmax:
            return jax.nn.softmax(logits, axis=-1)
        return logits


class RGBDecoder(nn.Module):
    """Camera-stream FCN decoder. Parity: pmf_net.py:183-222.

    use_packed: the final ×2 upsample + 3×3 logits conv run in the
    space-to-depth domain (exact; the bilinear blend becomes four
    half-res fused multiply-adds instead of a full-res resize, and the
    20-channel full-res conv becomes an 80-channel half-res one).
    """
    nclasses: int = 20
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    use_packed: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        dt = self.dtype

        def up_stage(x, name, kernel=(3, 3), padding=1, upsample=True):
            x = Conv(self.base_channels, kernel, padding=padding, dtype=dt,
                     name=f"{name}_conv")(x)
            x = leaky_relu(x)
            x = BatchNorm(dtype=dt, name=f"{name}_bn")(x, use_running_average=not train)
            return upsample_bilinear(x, 2) if upsample else x

        up4 = up_stage(inputs[3], "up_4a")
        up3 = up_stage(jnp.concatenate([up4, inputs[2]], -1), "up_3a")
        up2 = up_stage(jnp.concatenate([up3, inputs[1]], -1), "up_2a")
        up1h = up_stage(jnp.concatenate([up2, inputs[0]], -1), "up_1a",
                        kernel=(1, 1), padding=0,
                        upsample=not self.use_packed)
        if self.use_packed:
            up1p = upsample_bilinear_x2_packed(up1h)
            out = Conv(self.nclasses, (3, 3), padding=1, dtype=dt,
                       packed=True, name="conv")(up1p)
            out = depth_to_space(out).astype(jnp.float32)
        else:
            out = Conv(self.nclasses, (3, 3), padding=1, dtype=dt,
                       name="conv")(up1h).astype(jnp.float32)
        return jax.nn.softmax(out, axis=-1)


class PMFNet(nn.Module):
    """Two-stream fusion net. Parity: pmf_net.py:224-249.

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
        self.camera_stream_decoder = RGBDecoder(
            nclasses=self.nclasses,
            base_channels=self.camera_stream_encoder.expansion * 16,
            dtype=self.dtype, use_packed=self.use_packed)
        self.lidar_stream = SalsaNextFusion(
            nclasses=self.nclasses, base_channels=self.base_channels,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            use_packed=self.use_packed)

    def __call__(self, pcd_feature, img_feature, train: bool = False):
        img_feats = self.camera_stream_encoder(img_feature, train)
        lidar_pred = self.lidar_stream(pcd_feature, img_feats, train)
        camera_pred = self.camera_stream_decoder(img_feats, train)
        return lidar_pred, camera_pred

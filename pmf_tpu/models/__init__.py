from .salsanext import SalsaNext, ResContextBlock, ResBlock, UpBlock
from .resnet import ResNetEncoder, BasicBlock, Bottleneck
from .pmf import PMFNet, SalsaNextFusion, RGBDecoder, ASPP, ResidualBasedFusionBlock
from .modules import ConvUpSample, CSAttention
from .epmf import (
    EPMFNet, SalsaNextFusionV2, RGBDecoderV2, SparseVariantConv,
    SparseResContextBlock,
)

__all__ = [
    "SalsaNext", "ResContextBlock", "ResBlock", "UpBlock",
    "ResNetEncoder", "BasicBlock", "Bottleneck",
    "PMFNet", "SalsaNextFusion", "RGBDecoder", "ASPP",
    "ResidualBasedFusionBlock",
    "EPMFNet", "SalsaNextFusionV2", "RGBDecoderV2", "SparseVariantConv",
    "SparseResContextBlock",
    "ConvUpSample", "CSAttention",
]

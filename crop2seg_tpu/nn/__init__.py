from crop2seg_tpu.nn.layers import (
    Conv2d, ConvTranspose2d, ConvLayer, ConvBlock, DownConvBlock, UpConvBlock,
    DepthwiseSeparableConv2d, SqueezeAndExcitation,
    MBConv, MBConvLayer, MBConvBlock, MBDownConvBlock, MBUpConvBlock,
    make_norm, spatial_pad,
)
from crop2seg_tpu.nn.temporal import (
    pad_mask_from_input, pad_mask_from_lengths, temporally_shared,
)
from crop2seg_tpu.nn.positional import (
    PositionalEncoder, AbsolutePositionalEncoder, sinusoid_table,
)
from crop2seg_tpu.nn.ltae import (
    LTAE, LTAE4WTAE, MaskedLightweightAttention, attn_to_torch_layout,
)
from crop2seg_tpu.nn.aggregator import temporal_aggregate

from adnm_tpu.core.layers import (
    BiasFreeLayerNorm,
    RMSNorm,
    InstanceNorm,
    GroupNorm,
    Swish,
    IntensityGate,
    Conv2d,
    ConvLayer,
    DeConvLayer,
    Mlp,
    FeedForward,
    ConvFFD,
    scalar_param,
)
from adnm_tpu.core.wavelet import haar_dwt, haar_idwt, WTConv2d, WTConvLayer
from adnm_tpu.core.blocks import (
    PatchEmbed,
    SimplePatchEmbed,
    WTLayer,
    LayerToLayer,
    DownSample,
    UpSample,
    ChannelAttBridge,
    EncoderToDecoder,
    OutProj,
)

from .resample import (
    upfirdn2d,
    upsample_2d,
    downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
    setup_fir_kernel,
)
from .fused_act import fused_bias_act, fused_leaky_relu

__all__ = [
    "upfirdn2d",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
    "setup_fir_kernel",
    "fused_bias_act",
    "fused_leaky_relu",
]

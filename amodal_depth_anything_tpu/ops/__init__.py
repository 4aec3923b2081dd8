from .attention import default_attn_impl, multi_head_attention
from .conv import conv2d, conv2d_init, conv_transpose_same_stride, layer_norm_2d
from .flash_attention import mha, mha_reference
from .precision import dot_precision
from .resize import interpolate, resize2d, resize_nearest

__all__ = [
    "default_attn_impl", "multi_head_attention", "conv2d", "conv2d_init",
    "conv_transpose_same_stride", "layer_norm_2d", "mha", "mha_reference",
    "dot_precision", "interpolate", "resize2d", "resize_nearest",
]

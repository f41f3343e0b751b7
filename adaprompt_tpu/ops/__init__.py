from adaprompt_tpu.ops.layers import (
    layer_norm,
    group_norm,
    linear,
    conv2d,
    quick_gelu,
    silu,
)
from adaprompt_tpu.ops.attention import dot_product_attention

__all__ = [
    "layer_norm",
    "group_norm",
    "linear",
    "conv2d",
    "quick_gelu",
    "silu",
    "dot_product_attention",
]

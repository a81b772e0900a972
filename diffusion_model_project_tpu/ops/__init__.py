from .basic import (
    activation_function,
    get_padding,
    group_norm,
    max_pool_2x2,
    silu,
)
from .resize import (
    interpolate_bilinear,
    interpolate_trilinear,
    upsample_nearest_hw,
)
from .distance import distance_transform_edt
from .normalizer import MaxNormalizer
from .attention import multihead_attention

__all__ = [
    "activation_function",
    "get_padding",
    "group_norm",
    "max_pool_2x2",
    "silu",
    "interpolate_bilinear",
    "interpolate_trilinear",
    "upsample_nearest_hw",
    "distance_transform_edt",
    "MaxNormalizer",
    "multihead_attention",
]

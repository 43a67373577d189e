from naz_tpu.ops.masks import made_masks, made_degrees
from naz_tpu.ops.masked_dense import masked_linear, made_mlp
from naz_tpu.ops.bounding import bounding_transform, inverse_bounding_transform

__all__ = [
    "made_masks",
    "made_degrees",
    "masked_linear",
    "made_mlp",
    "bounding_transform",
    "inverse_bounding_transform",
]

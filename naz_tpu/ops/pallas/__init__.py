from naz_tpu.ops.pallas.made_fused import fused_made_affine_layer, pallas_available
from naz_tpu.ops.pallas.made_stack import fused_made_stack
from naz_tpu.ops.pallas.made_sample import (
    fused_made_sample_layer,
    fused_made_sample_stack,
)

__all__ = [
    "fused_made_affine_layer",
    "fused_made_sample_layer",
    "fused_made_sample_stack",
    "fused_made_stack",
    "pallas_available",
]

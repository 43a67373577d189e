from naz_tpu.ops.pallas.made_fused import fused_made_affine_layer, pallas_available

__all__ = ["fused_made_affine_layer", "pallas_available"]

from naz_tpu.compat.reference_import import flow_from_reference_arrays

__all__ = ["flow_from_reference_arrays"]

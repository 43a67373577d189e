from naz_tpu.distributions.core import (
    Normal,
    StandardNormal,
    Uniform,
    TruncatedNormal,
    normal_logpdf,
    standard_normal_logpdf,
)

__all__ = [
    "Normal",
    "StandardNormal",
    "Uniform",
    "TruncatedNormal",
    "normal_logpdf",
    "standard_normal_logpdf",
]

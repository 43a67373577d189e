from naz_tpu.stats.statutils import (
    hpd,
    hpd_vectorized,
    find_level,
    equal_quantile_binning_nd,
)
from naz_tpu.stats.model_comparison import compute_bic, amplification
from naz_tpu.stats.calibrate import calibrate, calibration_curve, posterior_predictive
from naz_tpu.stats.sbc import rank_uniformity, sbc_ranks
from naz_tpu.stats.kde import (
    bounded_kde_pdf,
    gaussian_kde_pdf,
    ppd_kde_bands,
)

__all__ = [
    "hpd",
    "hpd_vectorized",
    "find_level",
    "equal_quantile_binning_nd",
    "compute_bic",
    "amplification",
    "calibrate",
    "calibration_curve",
    "posterior_predictive",
    "sbc_ranks",
    "rank_uniformity",
    "gaussian_kde_pdf",
    "bounded_kde_pdf",
    "ppd_kde_bands",
]

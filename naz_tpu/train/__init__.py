from naz_tpu.train.mle import MLEConfig, TrainResult, train_mle
from naz_tpu.train.ensemble import (
    EnsembleConfig,
    EnsembleResult,
    ensemble_log_prob,
    ensemble_sample,
    mixture_log_prob,
    train_mle_ensemble,
)

__all__ = [
    "MLEConfig",
    "TrainResult",
    "train_mle",
    "EnsembleConfig",
    "EnsembleResult",
    "train_mle_ensemble",
    "ensemble_log_prob",
    "ensemble_sample",
    "mixture_log_prob",
]

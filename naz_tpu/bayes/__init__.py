from naz_tpu.bayes.wrapper import (
    BayesianFlow,
    make_flow_loglik,
)
from naz_tpu.bayes.exact import fit_chees, fit_nuts
from naz_tpu.bayes.svi import SVIConfig, SVIResult, fit_svi, sample_svi_posterior
from naz_tpu.bayes.importance import EvidenceResult, importance_evidence
from naz_tpu.bayes.evidence import (
    PowerEvidenceResult,
    SteppingStoneConfig,
    stepping_stone_evidence,
)

__all__ = [
    "BayesianFlow",
    "make_flow_loglik",
    "fit_nuts",
    "fit_chees",
    "SVIConfig",
    "SVIResult",
    "fit_svi",
    "sample_svi_posterior",
    "EvidenceResult",
    "importance_evidence",
    "PowerEvidenceResult",
    "SteppingStoneConfig",
    "stepping_stone_evidence",
]

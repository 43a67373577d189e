from naz_tpu.mcmc.hmc import HMCConfig, hmc_step, leapfrog
from naz_tpu.mcmc.nuts import NUTSConfig, nuts_step
from naz_tpu.mcmc.run import MCMCRunConfig, run_nuts, warmup_nuts
from naz_tpu.mcmc.chees import (
    ChEESConfig,
    run_chees,
    run_chees_checkpointed,
    chees_step,
    halton,
)
from naz_tpu.mcmc.diagnostics import split_rhat, effective_sample_size

__all__ = [
    "HMCConfig",
    "hmc_step",
    "leapfrog",
    "NUTSConfig",
    "nuts_step",
    "MCMCRunConfig",
    "run_nuts",
    "warmup_nuts",
    "ChEESConfig",
    "run_chees",
    "run_chees_checkpointed",
    "chees_step",
    "halton",
    "split_rhat",
    "effective_sample_size",
]

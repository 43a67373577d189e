"""naz_tpu — TPU-native Bayesian normalizing flows.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``AnaryaRay1/naz`` ("Normalizing flow Algorithms beyond Zero-variance
training"): conditional/unconditional density estimation with discrete and
continuous normalizing flows, fully Bayesian uncertainty quantification over
flow weights (NUTS/HMC, SVI with importance-sampling evidence, MC-dropout),
and model comparison (BIC, ESS) — designed TPU-first:

* pure functional transforms (pytree params), everything ``jit``/``scan``-able;
* one-pass density evaluation for the MLE/HMC hot path (MXU-friendly stacked
  masked matmuls), with the reference's fast-sampling orientation available
  for weight-import parity;
* our own scan-based, vmapped NUTS/HMC with dual-averaging + diagonal mass
  adaptation; chains/particles shard over a ``jax.sharding.Mesh`` via
  ``shard_map`` collectives (ICI), not host loops;
* Pallas kernels for the fused MADE-conditioner hot loop.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from naz_tpu.flows import Flow, MaskedAutoregressiveFlow  # noqa: F401

# Subpackages import lazily so `import naz_tpu` stays light (no h5py/
# matplotlib/optax pulls) while `naz_tpu.bayes.fit_nuts` etc. still resolve.
_SUBMODULES = (
    "bayes",
    "compat",
    "config",
    "data",
    "distributions",
    "flows",
    "io",
    "mcmc",
    "nn",
    "ops",
    "parallel",
    "stats",
    "train",
    "utils",
)


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"naz_tpu.{name}")
    raise AttributeError(f"module 'naz_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_SUBMODULES))

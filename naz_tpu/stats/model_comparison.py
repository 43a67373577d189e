"""Model comparison: BIC and the amplification statistic.

Parity with ``/root/reference/src/naz/flows/bflow_jax_maf.py:468-475``.
``amplification`` in the reference is broken as written (undefined
``sigma``, ``bflow_jax_maf.py:471``); the intended statistic — mean of
``mean^2 / std^2`` over the PPD ensemble of density grids — is implemented
here.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_bic(log_ls, n_data: int, complexity: int):
    """BIC = P log N - 2 max log L over posterior draws
    (``bflow_jax_maf.py:474-475``; driven by
    ``examples/papers/2506.05657/compute_bic_simpler.py:117-124``)."""
    log_ls = jnp.asarray(log_ls)
    return complexity * jnp.log(float(n_data)) - 2.0 * jnp.max(log_ls)


def amplification(pdf_ensemble):
    """Signal-to-noise of a posterior-predictive density ensemble:
    mean over grid cells of mean(pdf)^2 / std(pdf)^2, draws on axis 0."""
    p = jnp.asarray(pdf_ensemble)
    mean = jnp.mean(p, axis=0).ravel()
    std = jnp.std(p, axis=0).ravel()
    return jnp.mean(jnp.where(std > 0, (mean / std) ** 2, 0.0))

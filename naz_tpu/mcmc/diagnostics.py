"""Convergence diagnostics: split-R̂ and effective sample size.

The reference gets these implicitly from numpyro's ``print_summary``; here
they are standalone (Vehtari et al. 2021 split-R̂; ESS via FFT
autocorrelation with Geyer initial-monotone truncation). Inputs are
``(num_samples, num_chains, ...)`` arrays; trailing axes are treated as
independent parameters. On a sharded chain axis these reduce with
``all_gather`` (see naz_tpu.parallel); here they are plain jnp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _split_chains(x):
    n = x.shape[0] - (x.shape[0] % 2)
    x = x[:n]
    half = n // 2
    return jnp.concatenate([x[:half], x[half:]], axis=1)


def split_rhat(samples: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂; samples (n, chains, ...) -> (...)."""
    x = _split_chains(jnp.asarray(samples))
    n, m = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=0)
    chain_var = jnp.var(x, axis=0, ddof=1)
    between = n * jnp.var(chain_mean, axis=0, ddof=1)
    within = jnp.mean(chain_var, axis=0)
    var_est = (n - 1) / n * within + between / n
    # a trace that is constant to float resolution (e.g. the log-likelihood
    # projection of a tightly-concentrated weight posterior) has
    # within == between == 0: report R-hat = 1, not 0/0 = NaN
    degenerate = (within == 0) & (between == 0)
    return jnp.where(
        degenerate, 1.0, jnp.sqrt(var_est / jnp.where(degenerate, 1.0, within))
    )


def effective_sample_size(samples: jnp.ndarray) -> jnp.ndarray:
    """Bulk ESS; samples (n, chains, ...) -> (...). numpy implementation
    (post-processing path, not performance-critical)."""
    x = np.asarray(samples, dtype=np.float64)
    n, m = x.shape[0], x.shape[1]
    extra = x.shape[2:]
    x = x.reshape(n, m, -1)
    ess = np.empty(x.shape[-1])
    for j in range(x.shape[-1]):
        ess[j] = _ess_1d(x[:, :, j])
    return jnp.asarray(ess.reshape(extra) if extra else ess[0])


def _ess_1d(x: np.ndarray) -> float:
    n, m = x.shape
    x = x - x.mean(axis=0, keepdims=True)
    # per-chain autocovariance via FFT
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, nfft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=0)[:n].real / n
    chain_var = acov[0] * n / (n - 1)
    within = chain_var.mean()
    mean_acov = acov.mean(axis=1)
    between = n * np.var(x.mean(axis=0), ddof=1) if m > 1 else 0.0
    var_est = (n - 1) / n * within + between / n
    if var_est <= 0:
        return float(n * m)
    rho = 1.0 - (within - mean_acov) / var_est
    # Geyer: sum consecutive pairs while positive, enforce monotone decrease
    tau = 1.0
    prev = np.inf
    t = 1
    while t + 1 < n:
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        pair = min(pair, prev)
        prev = pair
        tau += 2.0 * pair
        t += 2
    return float(n * m / max(tau, 1e-12))

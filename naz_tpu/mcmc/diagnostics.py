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
import jax
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


def effective_sample_size(
    samples: jnp.ndarray, param_chunk: int = 4096
) -> jnp.ndarray:
    """Bulk ESS; samples (n, chains, ...) -> (...).

    Vectorized on device over ALL trailing parameter axes at once (FFT
    autocovariance + a vectorized Geyer initial-monotone truncation via
    cumulative min/product) — consistent with the diagnostics-as-
    collectives design (SURVEY §2.4) and usable on full weight
    posteriors, where the former host-side per-projection numpy loop was
    the bottleneck. ``param_chunk`` bounds device memory: the FFT
    workspace is (2n, chains, chunk) per batch."""
    x = jnp.asarray(samples)
    n, m = x.shape[0], x.shape[1]
    extra = x.shape[2:]
    x = x.reshape(n, m, -1)
    k = x.shape[-1]
    outs = []
    fn = jax.jit(_ess_batch, static_argnums=(1, 2))
    for j in range(0, k, param_chunk):
        outs.append(fn(x[:, :, j : j + param_chunk], n, m))
    ess = jnp.concatenate(outs)
    return ess.reshape(extra) if extra else ess[0]


def _ess_batch(x: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """ESS for (n, m, k) traces -> (k,). Same estimator as Vehtari et al.
    2021 bulk ESS: per-chain FFT autocovariance, pooled variance, Geyer
    paired sums accumulated while positive under a monotone-decrease
    clamp."""
    x = x - jnp.mean(x, axis=0, keepdims=True)
    # constant-to-float-resolution traces: the FFT of an exactly-zero
    # input returns ~1e-16 noise under jit, which would otherwise sail
    # through the var_est > 0 guard and report a garbage tau
    const = jnp.max(jnp.abs(x), axis=(0, 1)) == 0
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = jnp.fft.rfft(x, nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft, axis=0)[:n].real / n
    chain_var = acov[0] * n / (n - 1)  # (m, k)
    within = jnp.mean(chain_var, axis=0)  # (k,)
    mean_acov = jnp.mean(acov, axis=1)  # (n, k)
    if m > 1:
        between = n * jnp.var(jnp.mean(x, axis=0), axis=0, ddof=1)  # (k,)
    else:
        between = jnp.zeros_like(within)
    var_est = (n - 1) / n * within + between / n
    safe = jnp.where(var_est > 0, var_est, 1.0)
    rho = 1.0 - (within - mean_acov) / safe  # (n, k)
    # Geyer: pairs (rho[1]+rho[2]), (rho[3]+rho[4]), ... — accumulate
    # while the raw pair is non-negative (first negative stops the sum),
    # each kept pair clamped to be monotone non-increasing
    T = (n - 1) // 2
    if T > 0:
        pairs = rho[1 : 1 + 2 * T].reshape(T, 2, -1).sum(axis=1)  # (T, k)
        alive = jnp.cumprod(pairs >= 0, axis=0).astype(bool)
        clamped = jax.lax.cummin(pairs, axis=0)
        tau = 1.0 + 2.0 * jnp.sum(jnp.where(alive, clamped, 0.0), axis=0)
    else:
        tau = jnp.ones_like(within)
    ess = n * m / jnp.maximum(tau, 1e-12)
    return jnp.where(const | (var_est <= 0), float(n * m), ess)

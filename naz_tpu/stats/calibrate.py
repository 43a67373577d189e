"""Coverage calibration of posterior-predictive ensembles.

Capability parity with the reference's calibration engine
(``/root/reference/src/naz/flows/bflow_jax_maf.py:406-465``, driven by
``examples/papers/2506.05657/calibrate.py:126-174``): equal-quantile binning
of the truth samples, per-bin density of each posterior-predictive draw,
per-bin credible intervals (HPD or equal-tail) across draws, and empirical
coverage = fraction of nonzero-truth bins whose true density lands inside
the interval — bootstrapped ``fthin`` times over the draw ensemble.

TPU-first: the reference's per-draw host loops (physt/np.histogram2d,
``bflow_jax_maf.py:436-447``) become one vmapped ``histogramdd`` program;
PPD generation is a vmapped flow sampler (vs the Python loop at
``calibrate.py:147-150``), chunked over draws to bound device memory.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.stats.statutils import equal_quantile_edges, hpd_vectorized


def posterior_predictive(
    flow,
    params_draws,
    key,
    n_samples: int,
    context=None,
    draw_batch: Optional[int] = None,
):
    """Sample the flow under each posterior draw.

    ``params_draws``: params pytree with a leading draw axis (e.g.
    ``posterior["params"]`` reshaped to draws-first). Returns
    ``(n_draws, n_samples, dim)``; ``draw_batch`` chunks the draw axis to
    bound memory (10^6 samples x 10^3 draws does not fit at once).
    """
    n_draws = jax.tree.leaves(params_draws)[0].shape[0]
    keys = jax.random.split(jnp.asarray(key), n_draws)

    def one(draw_params, k):
        return flow.sample(draw_params, k, n_samples, context=context)

    if draw_batch is None or draw_batch >= n_draws:
        return jax.vmap(one)(params_draws, keys)

    chunks = []
    sample_fn = jax.jit(jax.vmap(one))
    for s in range(0, n_draws, draw_batch):
        e = min(s + draw_batch, n_draws)
        chunk = sample_fn(
            jax.tree.map(lambda a: a[s:e], params_draws), keys[s:e]
        )
        chunks.append(np.asarray(chunk))
    return jnp.asarray(np.concatenate(chunks, axis=0))


def _bin_densities(samples, edges):
    """Normalized histogram density for (n, d) samples on given edges."""
    hist, _ = jnp.histogramdd(samples, bins=edges, density=True)
    return hist


def calibrate(
    ppds,
    theta_true,
    nq: int,
    cs: Sequence[float],
    fthin: int = 10,
    itype: str = "hpd",
    ranges: Optional[Sequence] = None,
    key=None,
):
    """Empirical coverage at each credibility level in ``cs``.

    Args:
      ppds: (n_draws, n_samples, d) posterior-predictive sample sets.
      theta_true: (N, d) ground-truth samples.
      nq: total number of quantile bins (per-feature count = nq^(1/d)).
      cs: credibility levels, e.g. ``np.linspace(0.1, 0.95, 10)``.
      fthin: bootstrap rounds, each using n_draws/fthin random draws.
      itype: 'hpd' or 'eqt' per-bin intervals across draws.
      ranges: optional [(low, high)] per feature to clip the truth first
        (the reference's non-2d path, ``bflow_jax_maf.py:413-418``).

    Returns: (len(cs),) empirical coverage.
    """
    ppds = jnp.asarray(ppds)
    theta_true = np.asarray(theta_true)
    d = theta_true.shape[-1]
    if ranges is not None:
        keep = np.ones(len(theta_true), bool)
        for i, (lo, hi) in enumerate(ranges):
            keep &= (theta_true[:, i] >= lo) & (theta_true[:, i] <= hi)
        theta_true = theta_true[keep]

    nbins = max(1, int(round(nq ** (1.0 / d))))
    edges = [jnp.asarray(e) for e in equal_quantile_edges(theta_true, nbins)]

    den = _bin_densities(jnp.asarray(theta_true), edges)
    nonzero = den > 0
    n_nonzero = int(jnp.sum(nonzero))

    hist_draws = jax.jit(jax.vmap(lambda s: _bin_densities(s, edges)))

    key = jax.random.PRNGKey(0) if key is None else key
    n_draws = ppds.shape[0]
    n_per = max(1, n_draws // fthin)

    cs = np.asarray(cs)
    coverage = jnp.zeros(len(cs))
    for r in range(fthin):
        key, k = jax.random.split(key)
        idx = jax.random.choice(k, n_draws, (n_per,), replace=True)
        counts = hist_draws(ppds[idx])  # (n_per, *bins)
        for ci, c in enumerate(cs):
            if itype == "hpd":
                interval = hpd_vectorized(counts, alpha=1.0 - c)
            elif itype == "eqt":
                lo = jnp.quantile(counts, 0.5 - c / 2.0, axis=0)
                hi = jnp.quantile(counts, 0.5 + c / 2.0, axis=0)
                interval = jnp.stack([lo, hi], axis=0)
            else:
                raise ValueError(f"unknown interval type {itype!r}")
            inside = (den > interval[0]) & (den < interval[1]) & nonzero
            coverage = coverage.at[ci].add(jnp.sum(inside) / n_nonzero / fthin)
    return coverage


def calibration_curve(
    flow,
    posterior_params,
    theta_true,
    key,
    nq: int,
    cs: Sequence[float],
    n_samples: int = 100_000,
    context=None,
    fthin: int = 10,
    itype: str = "hpd",
    draw_batch: int = 64,
):
    """End-to-end: PPD generation + coverage (the reference's
    ``calibrate.py`` pipeline in one call)."""
    k_ppd, k_cal = jax.random.split(jnp.asarray(key))
    ppds = posterior_predictive(
        flow, posterior_params, k_ppd, n_samples, context=context, draw_batch=draw_batch
    )
    return calibrate(ppds, theta_true, nq, cs, fthin=fthin, itype=itype, key=k_cal)

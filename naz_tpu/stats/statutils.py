"""Interval/HPD/binning statistics.

Capability parity with ``/root/reference/src/naz/statutils.py:4-90``
(``hpd``, ``hpd_vectorized``, ``find_level``, ``equal_quantile_binning_nd``),
reimplemented on jnp with arbitrary trailing batch shapes (the reference's
vectorized HPD is hard-wired to ``(ns, nx, ny)``) and without the
pandas/physt dependencies: quantile bin edges come from ``jnp.quantile``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hpd(samples, alpha: float = 0.1):
    """Smallest interval containing ``1 - alpha`` of the 1-D samples."""
    x = jnp.sort(jnp.asarray(samples).ravel())
    n = x.shape[0]
    m = int(np.floor((1.0 - alpha) * n))
    if n - m <= 0:
        raise ValueError("too few samples for the requested credibility")
    widths = x[m:] - x[: n - m]
    i = int(jnp.argmin(widths))
    return [float(x[i]), float(x[i + m])]


def hpd_vectorized(samples, alpha: float = 0.1):
    """HPD along axis 0 for samples of shape (ns, ...); returns (2, ...)."""
    x = jnp.sort(jnp.asarray(samples), axis=0)
    ns = x.shape[0]
    m = int(np.floor((1.0 - alpha) * ns))
    if ns - m <= 0:
        raise ValueError("too few samples for the requested credibility")
    widths = x[m:] - x[: ns - m]
    idx = jnp.argmin(widths, axis=0)
    lo = jnp.take_along_axis(x, idx[None], axis=0)[0]
    hi = jnp.take_along_axis(x, (idx + m)[None], axis=0)[0]
    return jnp.stack([lo, hi], axis=0)


def find_level(density, mass: float = 0.9):
    """Density level whose superlevel set contains ``mass`` of the total."""
    d = jnp.sort(jnp.asarray(density).ravel())[::-1]
    c = jnp.cumsum(d)
    c = c / c[-1]
    return d[jnp.searchsorted(c, mass)]


def equal_quantile_edges(x, n_bins: int):
    """Per-feature equal-mass bin edges; x (n, d) -> list of (<= n_bins+1,) arrays.

    Duplicate quantiles (heavy ties) are dropped, matching
    ``pd.qcut(duplicates='drop')``.
    """
    x = np.asarray(x)
    edges = []
    for i in range(x.shape[1]):
        q = np.quantile(x[:, i], np.linspace(0.0, 1.0, n_bins + 1))
        edges.append(np.unique(q))
    return edges


def equal_quantile_binning_nd(x, n_bins: int = 4, return_bin_edges: bool = False):
    """Bin each feature into its equal-mass quantile bins independently.

    Returns integer bin indices (n, d) in ``[0, n_bins)`` (and the edges if
    requested).
    """
    x = np.asarray(x)
    if x.ndim != 2:
        raise ValueError("input must be 2-D (n_samples, n_features)")
    edges = equal_quantile_edges(x, n_bins)
    cols = []
    for i, e in enumerate(edges):
        idx = np.searchsorted(e, x[:, i], side="right") - 1
        cols.append(np.clip(idx, 0, len(e) - 2))
    binned = np.stack(cols, axis=1)
    return (binned, edges) if return_bin_edges else binned

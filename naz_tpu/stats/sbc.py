"""Simulation-based calibration (SBC) utilities.

Talts et al. 2018 (arXiv:1804.06788): for theta ~ prior and y ~ p(y|theta),
the rank of the true theta among L posterior draws is uniform on {0..L}
if (and only if, in distribution) the posterior machinery is calibrated.
This is the framework's acceptance test for its own samplers (the test
suite applies it to NUTS and ChEES on conjugate targets) and a user-facing
validation tool for flow posteriors — a sharper instrument than the
coverage-calibration engine (``stats/calibrate.py``), which checks the
posterior-predictive density rather than the sampler itself.

The uniformity p-value uses the regularized incomplete gamma function
(chi-square survival) so there is no SciPy dependency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def sbc_ranks(theta_true, posterior_draws) -> np.ndarray:
    """Rank of each true parameter among its posterior draws.

    ``theta_true``: (R,) or (R, d) true values, one per replication.
    ``posterior_draws``: (R, L) or (R, L, d) draws per replication.
    Returns integer ranks in {0..L} with the same leading shape as
    ``theta_true`` — ``sum(draws < true)`` per replication (and dim).

    Draws should be approximately independent (thin autocorrelated chains
    first); L+1 should divide the number of histogram bins used downstream.
    """
    t = np.asarray(theta_true)
    d = np.asarray(posterior_draws)
    if t.ndim + 1 != d.ndim:
        raise ValueError(
            f"draws must have one extra (draw) axis: true {t.shape}, "
            f"draws {d.shape}"
        )
    if t.ndim == 1:
        return (d < t[:, None]).sum(axis=1)
    return (d < t[:, None, :]).sum(axis=1)


def _chi2_sf(x: float, df: int) -> float:
    from jax.scipy.special import gammaincc

    return float(gammaincc(df / 2.0, x / 2.0))


def rank_uniformity(
    ranks,
    n_draws: int,
    n_bins: Optional[int] = None,
) -> Tuple[float, float, np.ndarray]:
    """Chi-square uniformity test of SBC ranks.

    ``ranks``: integer ranks in {0..n_draws} (any shape; flattened).
    ``n_bins``: histogram bins (default: ~sqrt(R) capped so expected
    count per bin >= 5). Returns ``(p_value, chi2, bin_counts)`` — a tiny
    p-value means the posterior machinery is mis-calibrated.
    """
    r = np.asarray(ranks).reshape(-1)
    R = r.size
    if n_bins is None:
        n_bins = int(max(2, min(np.sqrt(R), R / 5)))
    if (n_draws + 1) % n_bins:
        # bins must tile {0..L} evenly or uniform ranks look non-uniform
        divs = [b for b in range(n_bins, 1, -1) if (n_draws + 1) % b == 0]
        n_bins = divs[0] if divs else 2
    edges = np.linspace(0, n_draws + 1, n_bins + 1)
    counts, _ = np.histogram(r, bins=edges)
    expected = R / n_bins
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    return _chi2_sf(chi2, n_bins - 1), chi2, counts

"""Plot helpers for posterior/PPD analysis.

Counterparts of the reference's plot scripts
(``/root/reference/examples/papers/2506.05657/plot.py``, ``plot_svi.py:181-305``,
``plot_callibration.py:22-36``): 1-D marginal densities with HPD bands
(prior vs posterior vs truth), 90% contour levels, and nominal-vs-empirical
coverage curves. Matplotlib only at call time (headless-safe Agg backend).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from naz_tpu.stats.statutils import find_level, hpd_vectorized


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_marginal_bands(
    grid: np.ndarray,
    pdf_draws: np.ndarray,
    truth_pdf: Optional[np.ndarray] = None,
    credibility: float = 0.9,
    ax=None,
    label: str = "posterior",
    color="C0",
):
    """Per-grid-point HPD band over an ensemble of 1-D pdfs.

    ``pdf_draws``: (n_draws, n_grid) density evaluations per posterior draw
    (the reference's grid-evaluated per-draw pdfs, ``plot_svi.py:213-261``).
    """
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    band = np.asarray(hpd_vectorized(pdf_draws, alpha=1.0 - credibility))
    med = np.median(pdf_draws, axis=0)
    ax.fill_between(grid, band[0], band[1], alpha=0.3, color=color,
                    label=f"{label} {int(credibility*100)}% HPD")
    ax.plot(grid, med, color=color, lw=1.5, label=f"{label} median")
    if truth_pdf is not None:
        ax.plot(grid, truth_pdf, "k--", lw=1.2, label="truth")
    ax.legend()
    return ax


def plot_contour_level(
    x_grid: np.ndarray,
    y_grid: np.ndarray,
    density: np.ndarray,
    mass: float = 0.9,
    ax=None,
    **contour_kwargs,
):
    """Overlay the contour containing ``mass`` of the probability
    (reference ``find_level`` + contour overlays)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    level = float(find_level(density, mass))
    ax.contour(x_grid, y_grid, density, levels=[level], **contour_kwargs)
    return ax


def plot_calibration(
    nominal: Sequence[float],
    empirical,
    labels: Optional[Sequence[str]] = None,
    ax=None,
):
    """Nominal-vs-empirical coverage (reference ``plot_callibration.py``).

    ``empirical``: one curve or a list of curves (e.g. different nq).
    """
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    nominal = np.asarray(nominal)
    curves = np.atleast_2d(np.asarray(empirical))
    for i, c in enumerate(curves):
        lbl = labels[i] if labels is not None else None
        ax.plot(nominal, c, "o-", label=lbl)
    ax.plot([0, 1], [0, 1], "k--", lw=1)
    ax.set_xlabel("nominal coverage")
    ax.set_ylabel("empirical coverage")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    if labels is not None:
        ax.legend()
    return ax


def marginal_density_draws(samples, edges):
    """Per-draw 1-D histogram densities along every dimension.

    ``samples``: (n_draws, n_samples, d) posterior-predictive draws;
    ``edges``: length-d sequence of bin-edge arrays. Returns a list of d
    arrays, each (n_draws, n_bins_i) — the sample-based counterpart of the
    reference's grid-evaluated per-draw marginal pdfs
    (``plot_svi.py:213-261``), usable for any d without grid blowup.
    """
    samples = np.asarray(samples)
    out = []
    for j in range(samples.shape[-1]):
        e = np.asarray(edges[j])
        # normalize by the TOTAL sample count, not density=True: the grid
        # spans the truth's range, and a draw whose mass mostly falls
        # outside it must plot as near-flat, not be renormalized over the
        # in-range remainder (matters for weak prior-predictive bands)
        width = np.diff(e)
        dens = np.stack(
            [
                np.histogram(s, bins=e)[0] / (s.shape[0] * width)
                for s in samples[..., j]
            ]
        )
        out.append(dens)
    return out


def grid_pdf_draws(flow, params_draws, grid_points, context=None, batch: int = 64):
    """Evaluate exp(log_prob) on a grid for every posterior draw —
    vectorized replacement for the reference's per-draw pdf loops."""
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(grid_points)

    def one(p):
        return jnp.exp(flow.log_prob(p, pts, context=context))

    n = jax.tree.leaves(params_draws)[0].shape[0]
    fn = jax.jit(jax.vmap(one))
    out = []
    for s in range(0, n, batch):
        out.append(
            np.asarray(fn(jax.tree.map(lambda a: a[s : s + batch], params_draws)))
        )
    return np.concatenate(out, axis=0)

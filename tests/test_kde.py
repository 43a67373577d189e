"""KDE parity vs scipy.stats.gaussian_kde + ppd_kde_bands behavior.

The module mirrors the reference's notebook analysis
(``/root/reference/examples/papers/2506.05657/bayesian_amplification_kde.ipynb``),
which calls ``scipy.stats.gaussian_kde`` per posterior-predictive draw with
manual boundary reflection — so scipy IS the correctness oracle here.
"""

import numpy as np
import pytest
from scipy.stats import gaussian_kde

from naz_tpu.stats import bounded_kde_pdf, gaussian_kde_pdf, ppd_kde_bands


RNG = np.random.default_rng(0)


def test_kde_1d_scott_matches_scipy():
    x = RNG.normal(size=500)
    grid = np.linspace(-4, 4, 101)
    ours = np.asarray(gaussian_kde_pdf(grid, x))
    ref = gaussian_kde(x)(grid)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


def test_kde_default_eval_chunk_none():
    # ADVICE.md (round 1): the documented default call crashed with
    # TypeError; must work and agree with an explicit chunk.
    x = RNG.normal(size=300)
    grid = np.linspace(-3, 3, 50)
    a = np.asarray(gaussian_kde_pdf(grid, x))
    b = np.asarray(gaussian_kde_pdf(grid, x, eval_chunk=7))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_kde_silverman_and_float_bw():
    x = RNG.standard_t(df=5, size=400)
    grid = np.linspace(-5, 5, 64)
    ours = np.asarray(gaussian_kde_pdf(grid, x, bw="silverman"))
    ref = gaussian_kde(x, bw_method="silverman")(grid)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)

    ours = np.asarray(gaussian_kde_pdf(grid, x, bw=0.3))
    ref = gaussian_kde(x, bw_method=0.3)(grid)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


def test_kde_2d_weighted_matches_scipy():
    n = 600
    pts = RNG.multivariate_normal([0.0, 1.0], [[1.0, 0.4], [0.4, 0.8]], n)
    w = RNG.uniform(0.1, 1.0, n)
    gx, gy = np.meshgrid(np.linspace(-3, 3, 9), np.linspace(-2, 4, 9))
    grid = np.stack([gx.ravel(), gy.ravel()], -1)
    ours = np.asarray(gaussian_kde_pdf(grid, pts, weights=w))
    ref = gaussian_kde(pts.T, weights=w)(grid.T)
    np.testing.assert_allclose(ours, ref, rtol=5e-5, atol=1e-8)


def test_kde_single_sample_raises():
    with pytest.raises(ValueError, match="more than one"):
        gaussian_kde_pdf(np.array([0.0]), np.array([1.0]))


def test_bounded_kde_reflection():
    # Uniform(0,1) samples: plain KDE dips at the edges; reflected KDE
    # should be ~flat near 1.0 everywhere and exactly zero outside.
    x = RNG.uniform(0, 1, 4000)
    grid = np.linspace(-0.2, 1.2, 141)
    pdf = np.asarray(bounded_kde_pdf(grid, x, lo=0.0, hi=1.0))
    inside = (grid >= 0) & (grid <= 1)
    assert np.all(pdf[~inside] == 0.0)
    assert abs(pdf[inside].mean() - 1.0) < 0.05
    # matches the notebook's manual construction: pdf(x) + pdf(2lo - x) + pdf(2hi - x)
    kde = gaussian_kde(x)
    g = grid[inside]
    manual = kde(g) + kde(2 * 0.0 - g) + kde(2 * 1.0 - g)
    np.testing.assert_allclose(pdf[inside], manual, rtol=5e-5, atol=1e-7)


def test_ppd_kde_bands_shapes_and_normalization():
    draws = RNG.normal(size=(10, 400)) + RNG.normal(size=(10, 1))
    grid = np.linspace(-5, 5, 81)
    pdfs, band = ppd_kde_bands(draws, grid, alpha=0.1)
    assert pdfs.shape == (10, 81)
    assert band.shape == (2, 81)
    # each pdf trapezoid-normalized over the grid
    norms = np.trapezoid(pdfs, grid, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # HPD band brackets the pointwise ensemble
    assert np.all(band[0] <= pdfs.max(0) + 1e-9)
    assert np.all(band[1] >= pdfs.min(0) - 1e-9)
    assert np.all(band[0] <= band[1])


def test_ppd_kde_bands_bounded_and_chunk_pad():
    # n_draws not divisible by draw_chunk exercises the padding path
    draws = np.abs(RNG.normal(size=(5, 300)))
    grid = np.linspace(0, 4, 61)
    pdfs, band = ppd_kde_bands(draws, grid, lo=0.0, draw_chunk=2)
    assert pdfs.shape == (5, 61)
    assert np.all(pdfs >= 0)
    norms = np.trapezoid(pdfs, grid, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_kde_degenerate_weights_raise():
    """One dominant weight (n_eff -> 1) must raise, not emit NaN pdfs
    (ADVICE r1/r2: the n<=1 guard alone missed the weighted case)."""
    rng = np.random.default_rng(0)
    s = rng.normal(size=(50, 2))
    w = np.full(50, 1e-12)
    w[3] = 1.0
    with pytest.raises(ValueError, match="degenerate"):
        gaussian_kde_pdf(s[:5], s, weights=w)

import numpy as np
import jax.numpy as jnp
from scipy import stats as sps

from naz_tpu.stats import (
    amplification,
    compute_bic,
    equal_quantile_binning_nd,
    find_level,
    hpd,
    hpd_vectorized,
)


def test_hpd_normal():
    x = np.random.default_rng(0).normal(size=100_000)
    lo, hi = hpd(x, alpha=0.1)
    # for a symmetric unimodal density HPD == central interval
    assert abs(lo + 1.645) < 0.05 and abs(hi - 1.645) < 0.05


def test_hpd_skewed_is_shorter_than_equal_tail():
    x = np.random.default_rng(1).gamma(2.0, size=100_000)
    lo, hi = hpd(x, alpha=0.1)
    eq = np.quantile(x, [0.05, 0.95])
    assert (hi - lo) < (eq[1] - eq[0])
    assert lo < np.median(x) < hi


def test_hpd_vectorized_matches_scalar():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5000, 3, 2)) * rng.uniform(0.5, 2.0, size=(1, 3, 2))
    out = np.asarray(hpd_vectorized(x, alpha=0.2))
    assert out.shape == (2, 3, 2)
    for i in range(3):
        for j in range(2):
            lo, hi = hpd(x[:, i, j], alpha=0.2)
            np.testing.assert_allclose(out[:, i, j], [lo, hi], rtol=1e-5)


def test_find_level():
    g = np.linspace(-5, 5, 201)
    X, Y = np.meshgrid(g, g)
    d = np.exp(-0.5 * (X**2 + Y**2))
    lvl = float(find_level(d, 0.9))
    # mass within the superlevel set should be ~0.9
    frac = d[d >= lvl].sum() / d.sum()
    assert abs(frac - 0.9) < 0.02


def test_equal_quantile_binning():
    x = np.random.default_rng(3).normal(size=(10_000, 2))
    binned, edges = equal_quantile_binning_nd(x, n_bins=4, return_bin_edges=True)
    assert binned.shape == (10_000, 2)
    # each feature's bins should hold ~equal mass
    for i in range(2):
        counts = np.bincount(binned[:, i], minlength=4)
        assert (np.abs(counts - 2500) < 150).all(), counts
        assert len(edges[i]) == 5


def test_compute_bic():
    log_ls = jnp.array([-10.0, -8.0, -9.0])
    bic = float(compute_bic(log_ls, n_data=100, complexity=7))
    assert np.isclose(bic, 7 * np.log(100.0) + 16.0)


def test_amplification():
    rng = np.random.default_rng(4)
    base = rng.uniform(1.0, 2.0, size=(8, 8))
    ens = base[None] + 0.1 * rng.normal(size=(50, 8, 8))
    t = float(amplification(ens))
    assert 100 < t < 500  # (mean/std)^2 ~ (1.5/0.1)^2 = 225


def test_sbc_rank_utilities():
    """sbc_ranks + rank_uniformity: calibrated draws pass, biased fail."""
    from naz_tpu.stats import rank_uniformity, sbc_ranks

    rng = np.random.default_rng(0)
    R, L = 256, 63
    # calibrated: true and draws from the SAME distribution
    theta = rng.normal(size=R)
    draws = rng.normal(size=(R, L))
    ranks = sbc_ranks(theta, draws)
    assert ranks.shape == (R,) and ranks.min() >= 0 and ranks.max() <= L
    p, chi2, counts = rank_uniformity(ranks, L, n_bins=8)
    assert p > 1e-3 and counts.sum() == R
    # biased: posterior draws systematically offset
    ranks_bad = sbc_ranks(theta, draws - 1.5)
    p_bad, _, _ = rank_uniformity(ranks_bad, L, n_bins=8)
    assert p_bad < 1e-6
    # multi-dim shape handling
    theta2 = rng.normal(size=(R, 3))
    draws2 = rng.normal(size=(R, L, 3))
    r2 = sbc_ranks(theta2, draws2)
    assert r2.shape == (R, 3)
    # bin count auto-adjusts to divide L+1 evenly
    p3, _, c3 = rank_uniformity(r2, L)
    assert np.isfinite(p3) and (L + 1) % len(c3) == 0

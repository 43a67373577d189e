import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.stats import calibrate, posterior_predictive
from naz_tpu.flows import maf_flow


def _gaussian_ensemble(key, n_draws, n_samples, d=2, jitter=0.0):
    """PPD draws: standard normal samples, optionally with per-draw mean
    jitter (a miscalibrated / underdispersed ensemble when jitter=0 and the
    truth differs)."""
    keys = jax.random.split(key, n_draws)

    def one(k):
        k1, k2 = jax.random.split(k)
        shift = jitter * jax.random.normal(k1, (d,))
        return shift + jax.random.normal(k2, (n_samples, d))

    return jax.vmap(one)(keys)


def test_calibrated_ensemble_covers_nominally():
    """PPD draws from the true data distribution (with sampling noise
    matching the posterior spread) should give coverage ~ nominal."""
    key = jax.random.PRNGKey(0)
    truth = jax.random.normal(key, (40_000, 2))
    ppds = _gaussian_ensemble(jax.random.PRNGKey(1), 80, 8000, jitter=0.02)
    cs = np.linspace(0.1, 0.9, 5)
    cov = np.asarray(calibrate(ppds, truth, nq=25, cs=cs, fthin=4))
    # roughly monotone and bracketing the diagonal
    assert cov[-1] > cov[0]
    assert np.all(cov >= cs - 0.35) and np.all(cov <= cs + 0.35), (cs, cov)


def test_miscalibrated_ensemble_undercovers():
    """If every PPD draw is biased away from the truth, coverage collapses."""
    key = jax.random.PRNGKey(0)
    truth = jax.random.normal(key, (40_000, 2))
    biased = 1.0 + _gaussian_ensemble(jax.random.PRNGKey(1), 80, 8000, jitter=0.02)
    cs = np.array([0.5, 0.9])
    cov_ok = np.asarray(calibrate(
        _gaussian_ensemble(jax.random.PRNGKey(2), 80, 8000, jitter=0.02),
        truth, nq=25, cs=cs, fthin=4,
    ))
    cov_bad = np.asarray(calibrate(biased, truth, nq=25, cs=cs, fthin=4))
    assert cov_bad.sum() < cov_ok.sum()


def test_eqt_interval_type_and_ranges():
    truth = np.random.default_rng(0).normal(size=(20_000, 3))
    ppds = _gaussian_ensemble(jax.random.PRNGKey(1), 40, 4000, d=3, jitter=0.02)
    cov = np.asarray(
        calibrate(
            ppds,
            truth,
            nq=27,
            cs=[0.5, 0.9],
            fthin=2,
            itype="eqt",
            ranges=[(-3, 3)] * 3,
        )
    )
    assert cov.shape == (2,) and np.isfinite(cov).all()
    with pytest.raises(ValueError):
        calibrate(ppds, truth, nq=27, cs=[0.5], fthin=2, itype="nope")


def test_posterior_predictive_vmapped_and_chunked():
    flow = maf_flow(2, 2, (8,), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    # stack 6 posterior "draws" by jittering params
    draws = jax.tree.map(
        lambda a: jnp.stack([a + 0.01 * i for i in range(6)]), p0
    )
    full = posterior_predictive(flow, draws, jax.random.PRNGKey(1), 500)
    chunked = posterior_predictive(
        flow, draws, jax.random.PRNGKey(1), 500, draw_batch=2
    )
    assert full.shape == (6, 500, 2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-5)

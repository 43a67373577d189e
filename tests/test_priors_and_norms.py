import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.bayes import BayesianFlow, make_flow_loglik
from naz_tpu.flows import Flow, maf_flow
from naz_tpu.flows.norms import ActNorm
from naz_tpu.mcmc.run import MCMCRunConfig, run_nuts


def _bf(prior, scale_max=0.5):
    flow = maf_flow(2, 1, (8,), seed=0)
    params = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    return BayesianFlow(
        make_flow_loglik(flow, x), params, scale_max=scale_max, prior=prior
    )


@pytest.mark.parametrize("prior", ["uniform", "normal", "standard_normal", "truncnorm"])
def test_prior_families_potential_finite(prior):
    bf = _bf(prior)
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (bf.dim,))
    pot = float(bf.potential(u))
    assert np.isfinite(pot)
    g = jax.grad(bf.potential)(u)
    assert np.isfinite(np.asarray(g)).all()
    draws = bf.sample_prior(jax.random.PRNGKey(3), 32)
    assert np.isfinite(np.asarray(draws["params_flat"])).all()
    if prior in ("uniform", "truncnorm"):
        assert (np.abs(np.asarray(draws["standard"])) <= 1).all()


def test_prior_log_density_normalization_1d():
    """log_prior_standard must be a normalized density (checked on a grid
    for P=1 equivalents)."""
    g = np.linspace(-0.999, 0.999, 4001)
    for prior in ["uniform", "truncnorm"]:
        bf = _bf(prior)
        lp = np.array(
            [
                float(bf.log_prior_standard(jnp.array([v])))
                for v in g[::40]
            ]
        )
        assert np.isfinite(lp).all()
    # numeric integral of the truncnorm density over (-1,1) ~ 1
    bf = _bf("truncnorm")
    vals = np.exp([float(bf.log_prior_standard(jnp.array([v]))) for v in g])
    trapezoid = getattr(np, "trapezoid", None) or np.trapz
    integral = trapezoid(vals, g)
    assert abs(integral - 1.0) < 1e-2, integral


def test_normal_prior_regularizes_posterior():
    """With a normal prior, the posterior over weights must stay near the
    MLE (the prior pulls standard -> 0)."""
    bf = _bf("normal", scale_max=0.1)
    q0 = bf.init_positions(jax.random.PRNGKey(0), 2)
    cfg = MCMCRunConfig(num_warmup=100, num_samples=100, num_chains=2, max_depth=6)
    _, batch, _ = run_nuts(bf.potential, q0, cfg)
    std = np.asarray(batch.q)
    assert np.abs(std.mean()) < 1.0


def test_actnorm_roundtrip_and_data_init():
    t = ActNorm(3)
    x = 2.0 + 3.0 * jax.random.normal(jax.random.PRNGKey(0), (512, 3))
    params = t.init_params_from_data(x)
    z, ld_f = t.forward(params, x)
    np.testing.assert_allclose(float(jnp.mean(z)), 0.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(jnp.std(z, axis=0)), 1.0, atol=0.05)
    x2, ld_i = t.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)


def test_batchnorm_roundtrip_logdet_and_stats():
    from naz_tpu.flows.norms import BatchNorm

    t = BatchNorm(3)
    x = 2.0 + 3.0 * jax.random.normal(jax.random.PRNGKey(0), (512, 3))
    params = t.init_params_from_data(x)
    z, ld_f = t.forward(params, x)
    np.testing.assert_allclose(float(jnp.mean(z)), 0.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(jnp.std(z, axis=0)), 1.0, atol=0.05)
    x2, ld_i = t.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)
    # logdet matches autodiff
    g = jax.jacfwd(lambda x: t.forward(params, x)[0])(x[0])
    sign, logdet = np.linalg.slogdet(np.asarray(g))
    assert sign == 1
    np.testing.assert_allclose(float(ld_f[0]), logdet, rtol=1e-5)
    # EMA stats update moves toward the new batch; no grads into stats
    x_new = 10.0 + jax.random.normal(jax.random.PRNGKey(1), (512, 3))
    p2 = t.update_stats(params, x_new, momentum=0.5)
    assert float(p2["mean"][0]) > float(params["mean"][0]) + 2.0
    grads = jax.grad(lambda p: jnp.sum(t.forward(p, x)[1]))(params)
    np.testing.assert_allclose(np.asarray(grads["mean"]), 0.0)
    np.testing.assert_allclose(np.asarray(grads["var"]), 0.0)


@pytest.mark.parametrize("norm", ["actnorm", "batchnorm"])
def test_maf_flow_interleaved_norm(norm):
    flow = maf_flow(2, 3, (8,), context_dim=2, seed=0, norm=norm)
    assert len(flow.transforms) == 5  # 3 MAF blocks + 2 norm layers
    params = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    c = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    lp = flow.log_prob(params, x, context=c)
    assert lp.shape == (16,) and bool(jnp.isfinite(lp).all())
    s, lp_s = flow.sample_and_log_prob(params, jax.random.PRNGKey(3), 32, context=c[0])
    np.testing.assert_allclose(
        np.asarray(flow.log_prob(params, s, context=c[0])),
        np.asarray(lp_s),
        rtol=1e-3,
        atol=1e-3,
    )


def test_actnorm_composes_in_flow():
    maf = maf_flow(2, 2, (8,), seed=0).transforms[0]
    flow = Flow(dim=2, transforms=(ActNorm(2), maf))
    params = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    lp = flow.log_prob(params, x)
    assert lp.shape == (16,)
    s, lp_s = flow.sample_and_log_prob(params, jax.random.PRNGKey(2), 32)
    np.testing.assert_allclose(
        np.asarray(flow.log_prob(params, s)), np.asarray(lp_s), rtol=1e-3, atol=1e-3
    )


def test_welford_batch_merge_matches_sequential():
    from naz_tpu.mcmc.adapt import (
        welford_init, welford_update, welford_merge_batch, welford_variance,
    )
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (17, 5)) * jnp.arange(1.0, 6.0)
    seq = welford_init(5)
    for i in range(17):
        seq = welford_update(seq, x[i])
    merged = welford_merge_batch(welford_init(5), x)
    np.testing.assert_allclose(np.asarray(merged.mean), np.asarray(seq.mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.m2), np.asarray(seq.m2), rtol=1e-5)
    assert float(merged.count) == float(seq.count) == 17.0
    # two-stage merge (prior state + batch) also exact
    two = welford_merge_batch(welford_merge_batch(welford_init(5), x[:7]), x[7:])
    np.testing.assert_allclose(
        np.asarray(welford_variance(two)), np.asarray(welford_variance(seq)), rtol=1e-5
    )

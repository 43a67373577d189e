import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from naz_tpu.distributions import Normal, StandardNormal, TruncatedNormal, Uniform


def test_standard_normal_logpdf():
    d = StandardNormal(3)
    z = jnp.array([0.5, -1.0, 2.0])
    expect = stats.multivariate_normal(np.zeros(3), np.eye(3)).logpdf(np.asarray(z))
    np.testing.assert_allclose(float(d.log_prob(z)), expect, rtol=1e-6)


def test_truncated_normal_logprob_matches_scipy():
    loc, scale, low, high = 0.3, 1.2, -1.0, 1.0
    d = TruncatedNormal(loc, scale, low, high)
    x = jnp.linspace(-0.9, 0.9, 11)
    expect = stats.truncnorm.logpdf(
        np.asarray(x), (low - loc) / scale, (high - loc) / scale, loc, scale
    )
    np.testing.assert_allclose(np.asarray(d.log_prob(x)), expect, rtol=1e-4, atol=1e-5)


def test_truncated_normal_sampling_moments():
    loc, scale, low, high = 0.3, 1.2, -1.0, 1.0
    d = TruncatedNormal(loc, scale, low, high)
    s = d.sample(jax.random.PRNGKey(0), (200_000,))
    assert float(jnp.min(s)) >= low and float(jnp.max(s)) <= high
    ref = stats.truncnorm((low - loc) / scale, (high - loc) / scale, loc, scale)
    np.testing.assert_allclose(float(jnp.mean(s)), ref.mean(), atol=5e-3)
    np.testing.assert_allclose(float(jnp.std(s)), ref.std(), atol=5e-3)


def test_truncated_normal_sampling_is_reparameterized():
    def mean_sample(loc):
        d = TruncatedNormal(loc, 1.0, -1.0, 1.0)
        return jnp.mean(d.sample(jax.random.PRNGKey(1), (1000,)))

    g = jax.grad(mean_sample)(0.2)
    assert np.isfinite(float(g)) and float(g) > 0


def test_uniform_and_normal():
    u = Uniform(-2.0, 3.0)
    assert np.isclose(float(u.log_prob(jnp.array(0.0))), -np.log(5.0))
    assert float(u.log_prob(jnp.array(4.0))) == -np.inf
    n = Normal(1.0, 2.0)
    np.testing.assert_allclose(
        float(n.log_prob(jnp.array(0.5))), stats.norm.logpdf(0.5, 1.0, 2.0), rtol=1e-6
    )

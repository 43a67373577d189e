import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.flows import maf_flow


def test_log_prob_normalization_1d_grid():
    """Integrate exp(log_prob) over a 2-D grid — must be ~1."""
    flow = maf_flow(2, n_layers=3, hidden_dims=(16,), seed=0)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    g = jnp.linspace(-8, 8, 401)
    X, Y = jnp.meshgrid(g, g)
    pts = jnp.stack([X.ravel(), Y.ravel()], -1)
    lp = flow.log_prob(params, pts)
    h = float(g[1] - g[0])
    integral = float(jnp.sum(jnp.exp(lp))) * h * h
    assert abs(integral - 1.0) < 5e-3, integral


def test_sample_log_prob_consistency():
    flow = maf_flow(2, n_layers=2, hidden_dims=(16,), seed=1)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(2), p.shape), params
    )
    x, lp_sample = flow.sample_and_log_prob(params, jax.random.PRNGKey(3), 64)
    lp_eval = flow.log_prob(params, x)
    np.testing.assert_allclose(np.asarray(lp_sample), np.asarray(lp_eval), rtol=1e-3, atol=1e-3)


def test_bounded_flow():
    low = jnp.array([0.0, -1.0])
    high = jnp.array([1.0, 1.0])
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), bounds=(low, high), seed=2)
    params = flow.init_params(jax.random.PRNGKey(0))
    x = flow.sample(params, jax.random.PRNGKey(1), 256)
    assert bool(jnp.all((x > low) & (x < high)))
    # bounded_log_prob is -inf outside
    outside = jnp.array([[2.0, 0.0]])
    assert float(flow.bounded_log_prob(params, outside)[0]) == -np.inf
    # normalization over the box
    g0 = jnp.linspace(1e-3, 1 - 1e-3, 301)
    g1 = jnp.linspace(-1 + 1e-3, 1 - 1e-3, 301)
    X, Y = jnp.meshgrid(g0, g1)
    pts = jnp.stack([X.ravel(), Y.ravel()], -1)
    lp = flow.log_prob(params, pts)
    integral = float(jnp.sum(jnp.exp(lp))) * float(g0[1] - g0[0]) * float(g1[1] - g1[0])
    assert abs(integral - 1.0) < 2e-2, integral


def test_conditional_flow_sampling_broadcast():
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), context_dim=2, seed=3)
    params = flow.init_params(jax.random.PRNGKey(0))
    ctx = jnp.array([0.5, -0.5])
    x = flow.sample(params, jax.random.PRNGKey(1), 16, context=ctx)
    assert x.shape == (16, 2)
    lp = flow.log_prob(params, x, context=ctx)
    assert lp.shape == (16,)


def test_average_log_prob():
    flow = maf_flow(2, n_layers=1, hidden_dims=(8,), seed=4)
    params = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    alp = flow.average_log_prob(params, x)
    np.testing.assert_allclose(
        float(alp), float(jnp.mean(flow.log_prob(params, x))), rtol=1e-6
    )

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.flows import cnf_flow
from naz_tpu.flows.cnf import CNFTransform
from naz_tpu.ops.odeint import (
    odeint_adjoint,
    odeint_bosh3,
    odeint_dopri5,
    odeint_midpoint,
    odeint_rk4,
)
from naz_tpu.train import MLEConfig, train_mle


def test_odeint_rk4_exponential():
    # dy/dt = y  ->  y(1) = e
    y = odeint_rk4(lambda t, y: y, jnp.array(1.0), 0.0, 1.0, 32)
    np.testing.assert_allclose(float(y), np.e, rtol=1e-6)


def test_odeint_midpoint_exponential():
    y = odeint_midpoint(lambda t, y: y, jnp.array(1.0), 0.0, 1.0, 256)
    np.testing.assert_allclose(float(y), np.e, rtol=1e-4)


@pytest.mark.parametrize("solver", [odeint_dopri5, odeint_bosh3])
def test_odeint_adaptive_matches_rk4(solver):
    f = lambda t, y: jnp.sin(t) * y
    y_rk4 = odeint_rk4(f, jnp.array([2.0]), 0.0, 3.0, 128)
    y_ad = solver(f, jnp.array([2.0]), 0.0, 3.0, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(y_ad), np.asarray(y_rk4), rtol=1e-5)


def test_odeint_adaptive_harmonic_oscillator_reverse_time():
    # y'' = -y as a 2-D system, integrated backwards: y(t) = cos(t)
    f = lambda t, y: jnp.array([y[1], -y[0]])
    y0 = jnp.array([np.cos(2.0), -np.sin(2.0)])
    y = odeint_bosh3(f, y0, 2.0, 0.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y), [1.0, 0.0], atol=1e-4)


def test_odeint_adjoint_grads_match_backprop_through_rk4():
    """Continuous-adjoint gradients == discretize-then-optimize gradients
    (tight solver tolerances make both converge to the true gradient)."""
    params = {"a": jnp.array(0.7), "w": jnp.array([[0.3, -0.2], [0.1, 0.4]])}
    y0 = jnp.array([1.0, -0.5])

    def f(t, y, p):
        return jnp.tanh(p["w"] @ y) * p["a"] + 0.1 * jnp.sin(t) * y

    def loss_adjoint(p, y0):
        solve = lambda g, y, ta, tb: odeint_dopri5(g, y, ta, tb, rtol=1e-8, atol=1e-10)
        y1 = odeint_adjoint(solve, f, 0.0, 1.0, p, y0)
        return jnp.sum(y1**2)

    def loss_rk4(p, y0):
        y1 = odeint_rk4(lambda t, y: f(t, y, p), y0, 0.0, 1.0, 256)
        return jnp.sum(y1**2)

    ga = jax.grad(loss_adjoint, argnums=(0, 1))(params, y0)
    gr = jax.grad(loss_rk4, argnums=(0, 1))(params, y0)
    for a, r in zip(jax.tree.leaves(ga), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-3, atol=1e-5)


def _perturbed(flow, seed=1, scale=0.3):
    params = flow.init_params(jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda p: p + scale * jax.random.normal(jax.random.PRNGKey(seed), p.shape),
        params,
    )


@pytest.mark.parametrize("ctx", [0, 2])
@pytest.mark.parametrize("solver", ["rk4", "dopri5"])
def test_cnf_roundtrip(ctx, solver):
    flow = cnf_flow(2, (24,), context_dim=ctx, num_steps=48, solver=solver)
    params = _perturbed(flow)
    t, tp = flow.transforms[0], params["transforms"][0]
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    c = jax.random.normal(jax.random.PRNGKey(3), (8, ctx)) if ctx else None
    z, ld_f = t.forward(tp, x, context=c)
    x2, ld_i = t.inverse(tp, z, context=c)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-3)


def test_cnf_adaptive_solvers_match_rk4_density():
    flow_rk4 = cnf_flow(2, (24,), num_steps=128)
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    params = _perturbed(flow_rk4)
    lp_rk4 = flow_rk4.log_prob(params, x)
    for solver in ["dopri5", "bosh3"]:
        flow_ad = cnf_flow(2, (24,), solver=solver, rtol=1e-6, atol=1e-8)
        lp_ad = flow_ad.log_prob(params, x)
        np.testing.assert_allclose(
            np.asarray(lp_ad), np.asarray(lp_rk4), rtol=1e-4, atol=1e-4
        )


def test_cnf_adaptive_solver_trains():
    """Gradient flows through the continuous adjoint in an MLE step."""
    key = jax.random.PRNGKey(0)
    x = 0.5 * jax.random.normal(key, (256, 2)) + jnp.array([0.5, -0.2])
    flow = cnf_flow(2, (16,), solver="bosh3", rtol=1e-4, atol=1e-6)
    params = flow.init_params(jax.random.PRNGKey(1))

    def nll(p):
        return -jnp.mean(flow.log_prob(p, x))

    import optax

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(nll(params))
    for _ in range(30):
        g = jax.grad(nll)(params)
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
    l1 = float(nll(params))
    assert np.isfinite(l1) and l1 < l0 - 0.1, (l0, l1)


def test_cnf_logdet_matches_autodiff():
    flow = cnf_flow(2, (16,), num_steps=64)
    params = _perturbed(flow)
    t, tp = flow.transforms[0], params["transforms"][0]
    x = jnp.array([0.3, -0.7])
    J = jax.jacfwd(lambda x: t.forward(tp, x)[0])(x)
    _, ld = t.forward(tp, x)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign == 1
    np.testing.assert_allclose(float(ld), logdet, rtol=1e-3, atol=1e-3)


def test_cnf_hutchinson_trace_unbiasedness():
    tf = CNFTransform.create(3, (16,), trace="hutchinson")
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(4), p.shape),
        tf.init_params(jax.random.PRNGKey(0)),
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (3,))
    exact = CNFTransform.create(3, (16,), trace="exact")
    _, tr_exact = exact._vf_and_trace(params, 0.5, x, None, None)
    keys = jax.random.split(jax.random.PRNGKey(6), 2000)
    estimates = jax.vmap(
        lambda k: tf._vf_and_trace(
            params, 0.5, x, None, jax.random.rademacher(k, x.shape, dtype=x.dtype)
        )[1]
    )(keys)
    np.testing.assert_allclose(
        float(jnp.mean(estimates)), float(tr_exact), atol=0.05
    )


def test_cnf_normalization():
    flow = cnf_flow(2, (16,), num_steps=32)
    params = _perturbed(flow, seed=7)
    g = jnp.linspace(-8, 8, 201)
    X, Y = jnp.meshgrid(g, g)
    pts = jnp.stack([X.ravel(), Y.ravel()], -1)
    lp = flow.log_prob(params, pts)
    h = float(g[1] - g[0])
    integral = float(jnp.sum(jnp.exp(lp))) * h * h
    assert abs(integral - 1.0) < 1e-2, integral


def test_cnf_mle_training():
    key = jax.random.PRNGKey(0)
    x = 0.6 * jax.random.normal(key, (2000, 2)) + jnp.array([0.8, -0.3])
    flow = cnf_flow(2, (32,), num_steps=16)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=60, batch_frac=0.5, patience=20)
    )
    s = np.asarray(flow.sample(res.params, jax.random.PRNGKey(1), 8000))
    np.testing.assert_allclose(s.mean(0), [0.8, -0.3], atol=0.15)
    np.testing.assert_allclose(s.std(0), [0.6, 0.6], atol=0.15)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.flows import nsa_flow, nsc_flow
from naz_tpu.flows.spline import SplineAutoregressiveFlow, SplineCoupling
from naz_tpu.ops.lrs import lrs_forward, lrs_inverse, prepare_lrs_params
from naz_tpu.ops.rqs import prepare_rqs_params, rqs_forward, rqs_inverse
from naz_tpu.train import MLEConfig, train_mle


def test_rqs_roundtrip_and_identity_init():
    raw = jax.random.normal(jax.random.PRNGKey(0), (64, 3, 23))
    xk, yk, dk = prepare_rqs_params(raw, 8, 4.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-6, maxval=6)
    y, ld_f = rqs_forward(x, xk, yk, dk, 4.0)
    x2, ld_i = rqs_inverse(y, xk, yk, dk, 4.0)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)
    # zero raw params -> identity map inside the bound
    xk0, yk0, dk0 = prepare_rqs_params(jnp.zeros((5, 23)), 8, 4.0)
    x0 = jnp.linspace(-3.9, 3.9, 5)
    y0, ld0 = rqs_forward(x0, xk0, yk0, dk0, 4.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld0), 0.0, atol=1e-2)


def test_rqs_logdet_matches_autodiff():
    raw = jax.random.normal(jax.random.PRNGKey(2), (23,))
    xk, yk, dk = prepare_rqs_params(raw, 8, 3.0)

    def f(x):
        return rqs_forward(x, xk, yk, dk, 3.0)[0]

    for xv in [-2.5, -0.3, 0.0, 1.7, 2.9]:
        g = jax.grad(lambda x: f(x))(jnp.asarray(xv))
        _, ld = rqs_forward(jnp.asarray(xv), xk, yk, dk, 3.0)
        np.testing.assert_allclose(float(ld), np.log(abs(float(g))), rtol=1e-3)


def test_lrs_roundtrip_and_identity_init():
    raw = jax.random.normal(jax.random.PRNGKey(0), (64, 3, 31))
    knots = prepare_lrs_params(raw, 8, 4.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-6, maxval=6)
    y, ld_f = lrs_forward(x, *knots, 4.0)
    # monotone: order preserved along a sorted axis
    xs = jnp.sort(x, axis=0)
    ys, _ = lrs_forward(xs, *jax.tree.map(lambda a: a[:1], knots), 4.0)
    assert bool(jnp.all(jnp.diff(ys, axis=0) > 0))
    x2, ld_i = lrs_inverse(y, *knots, 4.0)
    # f32 tolerance is looser than RQS: the Moebius pieces are exact in f64
    # but worse-conditioned in low-derivative bins
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-3)
    # zero raw params -> identity map inside the bound
    knots0 = prepare_lrs_params(jnp.zeros((5, 31)), 8, 4.0)
    x0 = jnp.linspace(-3.9, 3.9, 5)
    y0, ld0 = lrs_forward(x0, *knots0, 4.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld0), 0.0, atol=1e-2)


def test_lrs_logdet_matches_autodiff():
    raw = jax.random.normal(jax.random.PRNGKey(2), (31,))
    knots = prepare_lrs_params(raw, 8, 3.0)

    def f(x):
        return lrs_forward(x, *knots, 3.0)[0]

    for xv in [-2.5, -0.3, 0.0, 1.7, 2.9]:
        g = jax.grad(f)(jnp.asarray(xv))
        _, ld = lrs_forward(jnp.asarray(xv), *knots, 3.0)
        np.testing.assert_allclose(float(ld), np.log(abs(float(g))), rtol=1e-3)


def test_lrs_c1_at_lambda():
    """Derivative is continuous across the learned middle knot."""
    raw = jax.random.normal(jax.random.PRNGKey(3), (31,))
    xk, yk, dk, lam = prepare_lrs_params(raw, 8, 3.0)
    # middle point of bin 4
    x0, x1 = float(xk[4]), float(xk[5])
    xm = x0 + float(lam[4]) * (x1 - x0)
    eps = 1e-4
    _, ld_lo = lrs_forward(jnp.asarray(xm - eps), xk, yk, dk, lam, 3.0)
    _, ld_hi = lrs_forward(jnp.asarray(xm + eps), xk, yk, dk, lam, 3.0)
    np.testing.assert_allclose(float(ld_lo), float(ld_hi), rtol=1e-2)


@pytest.mark.parametrize("builder", [nsa_flow, nsc_flow])
@pytest.mark.parametrize("ctx", [0, 2])
@pytest.mark.parametrize("order", ["quadratic", "linear"])
def test_spline_flow_roundtrip(builder, ctx, order):
    kwargs = dict(context_dim=ctx) if ctx else {}
    flow = builder(3, 3, (16,), seed=0, order=order, **kwargs)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    t, tp = flow.transforms[0], params["transforms"][0]
    x = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    c = jax.random.normal(jax.random.PRNGKey(3), (10, ctx)) if ctx else None
    z, ld_f = t.forward(tp, x, context=c)
    x2, ld_i = t.inverse(tp, z, context=c)
    tol = 1e-3 if order == "quadratic" else 2e-2  # LRS f32 conditioning
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=tol)


@pytest.mark.parametrize("builder", [nsa_flow, nsc_flow])
@pytest.mark.parametrize("order", ["quadratic", "linear"])
def test_spline_logdet_matches_autodiff(builder, order):
    flow = builder(3, 2, (16,), seed=1, order=order)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    t, tp = flow.transforms[0], params["transforms"][0]
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (3,))
    J = jax.jacfwd(lambda x: t.forward(tp, x)[0])(x)
    _, ld = t.forward(tp, x)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign == 1
    np.testing.assert_allclose(float(ld), logdet, rtol=1e-3, atol=1e-3)


def test_spline_flow_normalization():
    flow = nsa_flow(2, 2, (16,), seed=2, count_bins=6)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(5), p.shape), params
    )
    g = jnp.linspace(-9, 9, 361)
    X, Y = jnp.meshgrid(g, g)
    pts = jnp.stack([X.ravel(), Y.ravel()], -1)
    lp = flow.log_prob(params, pts)
    h = float(g[1] - g[0])
    integral = float(jnp.sum(jnp.exp(lp))) * h * h
    assert abs(integral - 1.0) < 1e-2, integral


def test_spline_mle_fits_bimodal():
    """Affine MAF struggles with separated modes; splines should not."""
    key = jax.random.PRNGKey(0)
    n = 4000
    comp = jax.random.bernoulli(key, 0.5, (n, 1))
    x = jnp.where(comp, 1.5, -1.5) + 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), (n, 2)
    )
    flow = nsa_flow(2, 2, (32,), seed=0, count_bins=8)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=200, batch_frac=0.25, patience=30)
    )
    s = np.asarray(flow.sample(res.params, jax.random.PRNGKey(2), 20000))
    # both modes populated
    frac_pos = (s[:, 0] > 0).mean()
    assert 0.35 < frac_pos < 0.65
    # the trough at 0 must be much lower than the modes
    lp_mode = float(flow.log_prob(res.params, jnp.array([[1.5, 1.5]]))[0])
    lp_trough = float(flow.log_prob(res.params, jnp.array([[0.0, 0.0]]))[0])
    assert lp_mode - lp_trough > 2.0

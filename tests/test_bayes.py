import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes import BayesianFlow, make_flow_loglik
from naz_tpu.bayes.exact import fit_nuts
from naz_tpu.flows import maf_flow
from naz_tpu.mcmc.run import MCMCRunConfig
from naz_tpu.train import MLEConfig, train_mle


def _tiny_setup(seed=0, n=512):
    key = jax.random.PRNGKey(seed)
    x = 0.7 * jax.random.normal(key, (n, 2)) + jnp.array([0.5, -0.2])
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), seed=seed)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=120, batch_frac=0.5, patience=20)
    )
    return flow, res.params, x


def test_bayesian_wrapper_shapes_and_potential():
    flow, params, x = _tiny_setup()
    bf = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.05)
    P = bf.num_weights
    assert bf.dim == P and bf.complexity == P
    u = jnp.zeros(P)
    pot = float(bf.potential(u))
    assert np.isfinite(pot)
    # at u=0, params == MLE params
    c = bf.constrain(u)
    flat, _ = jax.flatten_util.ravel_pytree(params)
    np.testing.assert_allclose(np.asarray(c["params_flat"]), np.asarray(flat), rtol=1e-6)
    # gradient must exist and be finite
    g = jax.grad(bf.potential)(u)
    assert np.isfinite(np.asarray(g)).all()


def test_bayesian_wrapper_free_scale():
    flow, params, x = _tiny_setup()
    bf = BayesianFlow(
        make_flow_loglik(flow, x), params, scale_max=0.1, fixed_scale=False
    )
    assert bf.dim == bf.num_weights + 1
    c = bf.constrain(jnp.zeros(bf.dim))
    assert 0.0 < float(c["scale"]) < 0.1
    prior = bf.sample_prior(jax.random.PRNGKey(0), 16)
    assert prior["params_flat"].shape == (16, bf.num_weights)
    assert (np.abs(np.asarray(prior["standard"])) <= 1).all()


def test_exact_bayesian_end_to_end():
    """The minimum end-to-end slice of SURVEY.md §7: MLE -> NUTS posterior
    over weights -> posterior-predictive draws covering the truth."""
    flow, params, x = _tiny_setup()
    bf = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.02)
    cfg = MCMCRunConfig(num_warmup=150, num_samples=150, num_chains=2, seed=0, max_depth=8)
    post = fit_nuts(bf, cfg)

    assert post["params_flat"].shape[:2] == (150, 2)
    d = post["diagnostics"]
    assert d["divergence_fraction"] < 0.05
    assert (d["split_rhat"] < 1.3).all(), d["split_rhat"]

    # posterior log-lik should stay near the MLE value (tight prior)
    ll_mle = float(bf.log_likelihood_flat(bf._flat_mle))
    ll_post = np.asarray(post["log_likelihood"])
    # the early-stopped "MLE" isn't the exact optimum; draws may nudge past it
    assert ll_post.max() <= ll_mle + 5.0
    assert ll_post.mean() > ll_mle - 0.5 * bf.num_weights  # not collapsed

    # posterior-predictive: sample the flow under a few posterior draws
    some = post["params"]
    draw = jax.tree.map(lambda a: a[10, 0], some)
    s = flow.sample(draw, jax.random.PRNGKey(1), 4000)
    m = np.asarray(jnp.mean(s, 0))
    np.testing.assert_allclose(m, [0.5, -0.2], atol=0.25)


def test_checkpointed_exact_bayesian(tmp_path):
    flow, params, x = _tiny_setup()
    bf = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.02)
    cfg = MCMCRunConfig(num_warmup=80, num_samples=40, num_chains=2, seed=1, max_depth=6)
    post = fit_nuts(bf, cfg, checkpoint_dir=str(tmp_path / "ck"), nbatch=20)
    assert post["params_flat"].shape[:2] == (40, 2)
    assert (tmp_path / "ck" / "mcmc_state.npz").exists()


def test_exact_bayesian_over_spline_flow():
    """BayesianFlow is flow-family agnostic: exact NUTS over the weights of
    a neural-spline AR flow (the reference's Bayesian path was MAF-only —
    bflow_jax_maf.py reimplements just the MAF)."""
    from naz_tpu.flows import nsa_flow

    key = jax.random.PRNGKey(0)
    x = 0.6 * jax.random.normal(key, (256, 2)) + jnp.array([0.3, -0.1])
    flow = nsa_flow(2, n_layers=2, hidden_dims=(8,), count_bins=4, seed=0)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=60, batch_frac=0.5, patience=20)
    )
    bf = BayesianFlow(make_flow_loglik(flow, x), res.params, scale_max=0.02)
    post = fit_nuts(
        bf,
        MCMCRunConfig(num_warmup=40, num_samples=40, num_chains=2, seed=0,
                      max_depth=6),
    )
    assert post["params_flat"].shape[:2] == (40, 2)
    assert np.isfinite(np.asarray(post["log_likelihood"])).all()
    assert float(post["diagnostics"]["divergence_fraction"]) < 0.5


def test_constrain_host_matches_device_all_priors():
    """The numpy post-processing twin must match the jax constrain to f32
    round-off, centered and not, for every prior family / scale mode."""
    import itertools

    flow = maf_flow(2, 2, (8,), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    rng = np.random.default_rng(2)
    for prior, (fixed, multi) in itertools.product(
        ("uniform", "normal", "standard_normal", "truncnorm"),
        ((True, False), (False, False), (False, True)),
    ):
        bf = BayesianFlow(
            make_flow_loglik(flow, x), p0, scale_max=0.3, prior=prior,
            fixed_scale=fixed, multi_scale=multi,
        )
        u = rng.standard_normal((3, bf.dim)).astype(np.float32)
        for centered in (False, True):
            ch = bf.constrain_host(u, centered=centered)
            for i in range(3):
                cd = bf.constrain(jnp.asarray(u[i]), centered=centered)
                np.testing.assert_allclose(
                    ch["params_flat"][i], np.asarray(cd["params_flat"]),
                    rtol=2e-6, atol=2e-6,
                )
                np.testing.assert_allclose(
                    ch["log_det"][i], float(cd["log_det"]), rtol=2e-5, atol=2e-4
                )
                np.testing.assert_allclose(
                    ch["log_prior"][i], float(cd["log_prior"]),
                    rtol=2e-5, atol=2e-4,
                )


def test_potential_centered_is_constant_shift():
    """potential_centered = potential + const (independent of u), and the
    const equals the log-Jacobian at u=0 (-P*log2 for the uniform box)."""
    flow = maf_flow(2, 2, (8,), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    bf = BayesianFlow(make_flow_loglik(flow, x), p0, scale_max=0.3)
    u1 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (bf.dim,))
    u2 = -0.2 * jax.random.normal(jax.random.PRNGKey(3), (bf.dim,))
    d1 = float(bf.potential(u1) - bf.potential_centered(u1))
    d2 = float(bf.potential(u2) - bf.potential_centered(u2))
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    # the uniform box's log-Jacobian carries -P*log2; dropping it RAISES
    # the log-density, i.e. lowers the centered potential by P*log2
    np.testing.assert_allclose(
        d1, bf.num_weights * np.log(2.0), rtol=1e-5
    )

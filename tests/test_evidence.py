"""Stepping-stone / TI evidence (beyond-reference model comparison)."""

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes import (
    BayesianFlow,
    SteppingStoneConfig,
    importance_evidence,
    make_flow_loglik,
    stepping_stone_evidence,
)
from naz_tpu.flows import maf_flow
from naz_tpu.train import MLEConfig, train_mle


def _tiny_setup(seed=0, n=512):
    key = jax.random.PRNGKey(seed)
    x = 0.7 * jax.random.normal(key, (n, 2)) + jnp.array([0.5, -0.2])
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), seed=seed)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=120, batch_frac=0.5, patience=20)
    )
    return flow, res.params, x


def test_stepping_stone_matches_tight_prior_reference():
    """With a tight prior the evidence is ~ll_mle and prior-proposal IS is
    near-exact; stepping stone must agree with both, and TI with SS."""
    flow, params, x = _tiny_setup()
    bf = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.002)
    ll_mle = float(bf.log_likelihood_flat(bf._flat_mle))
    ev_is = importance_evidence(bf, None, jax.random.PRNGKey(0), num_samples=400)
    ev_ss = stepping_stone_evidence(
        bf,
        SteppingStoneConfig(
            n_temps=8, num_warmup=150, num_warmup_rest=40, num_samples=60,
            num_chains=2, seed=0, max_depth=6,
        ),
    )
    assert np.isfinite(ev_ss.log_evidence)
    assert abs(ev_ss.log_evidence - ll_mle) < 5.0
    assert abs(ev_ss.log_evidence - ev_is.log_evidence) < 5.0
    # TI cross-check on the same draws
    assert abs(ev_ss.log_evidence - ev_ss.log_evidence_ti) < 5.0
    # ladder diagnostics: monotone betas, finite per-rung ESS
    assert (np.diff(ev_ss.betas) > 0).all()
    assert ev_ss.per_step_ess.min() >= 1.0
    assert ev_ss.mean_log_l.shape == (8,)


def test_stepping_stone_prefers_true_model():
    """Model comparison: evidence of a flow MLE-fitted to the data must
    beat the same architecture left at a random (untrained) init."""
    flow, params, x = _tiny_setup()
    cfg = SteppingStoneConfig(
        n_temps=6, num_warmup=120, num_warmup_rest=30, num_samples=50,
        num_chains=2, seed=1, max_depth=6,
    )
    bf_good = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.01)
    bad_params = flow.init_params(jax.random.PRNGKey(99))
    bf_bad = BayesianFlow(make_flow_loglik(flow, x), bad_params, scale_max=0.01)
    ev_good = stepping_stone_evidence(bf_good, cfg)
    ev_bad = stepping_stone_evidence(bf_bad, cfg)
    assert ev_good.log_evidence > ev_bad.log_evidence

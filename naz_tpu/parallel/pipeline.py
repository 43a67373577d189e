"""Full multi-chip pipeline: MLE -> windowed warmup -> checkpointed
sampling -> kill -> resume -> diagnostics, under a ``(chains, data)``
mesh.

The reference's equivalent is the elastic NUTS driver run with chains
across devices (``/root/reference/src/naz/flows/bflow_jax_maf.py:321-404``:
numpyro chain_method="parallel" over ``jax.local_device_count()`` plus the
checkpoint/resume loop). TPU-native redesign: chains stay a batch axis of
ONE jitted program sharded over the ``chains`` mesh axis, the dataset
shards over ``data`` (likelihood reduction lowers to a psum on ICI), and
the checkpoint files are placement-free host pytrees re-placed on the
mesh at resume (``run_chees_checkpointed(place=...)``).

Used by both ``tests/test_parallel.py`` (virtual 8-CPU mesh, statistical
agreement vs the unsharded run) and ``__graft_entry__.dryrun_multichip``
(the driver's multi-chip validation) — the production-*shaped* model
(full stacked-layer scan, conditional context) at width thinned for CPU,
so the partitioning of the stacked-weight scan is actually exercised.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.parallel.mesh import (
    make_mesh,
    shard_chees_state,
    sharded_loglik,
)


def multichip_pipeline(
    mesh=None,
    n_chains: int = 8,
    n_layers: int = 16,
    hidden=(24, 24, 24),
    n_data: int = 128,
    num_warmup: int = 120,
    num_samples: int = 48,
    checkpoint_dir: Optional[str] = None,
    mle_steps: int = 10,
    max_leapfrogs: int = 32,
    seed: int = 0,
) -> dict:
    """Run the complete Bayesian-flow pipeline once; returns diagnostics.

    With ``mesh=None`` everything executes unsharded (the single-chip
    baseline the sharded run is compared against). With a mesh, the
    training set shards over ``data``, the chain axis over ``chains``,
    and — when ``checkpoint_dir`` is given — sampling runs in two legs
    with a simulated kill between them: leg 1 collects half the draws and
    returns (as a SIGKILL would, after its batch files land), leg 2
    resumes from the on-disk checkpoint through the zero-cost template +
    ``place`` re-placement path and finishes.
    """
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow
    from naz_tpu.mcmc.chees import ChEESConfig, run_chees, run_chees_checkpointed
    from naz_tpu.mcmc.diagnostics import effective_sample_size, split_rhat

    # synthetic conditional population in the reference's (theta | lambda)
    # layout — the 2506.05657 workload shape at reduced width
    key = jax.random.PRNGKey(seed)
    lam = jax.random.uniform(key, (n_data, 2), minval=-1, maxval=1)
    theta = jnp.stack(
        [
            lam[:, 0] + 0.3 * jax.random.normal(jax.random.PRNGKey(seed + 1), (n_data,)),
            0.5 * lam[:, 1]
            + 0.2 * jax.random.normal(jax.random.PRNGKey(seed + 2), (n_data,)),
        ],
        -1,
    )

    flow = maf_flow(
        2, n_layers=n_layers, hidden_dims=tuple(hidden), context_dim=2, seed=seed
    )
    params = flow.init_params(jax.random.PRNGKey(seed + 3))

    if mesh is not None:
        loglik = sharded_loglik(flow, theta, context=lam, mesh=mesh)
    else:
        loglik = make_flow_loglik(flow, theta, lam)

    # data-parallel MLE refinement: the gradient's data reduction is the
    # same psum the potential uses, so this also exercises dp training
    import optax

    opt = optax.adam(1e-3)

    @jax.jit
    def mle_step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: -loglik(p).mean())(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    opt_state = opt.init(params)
    for _ in range(mle_steps):
        params, opt_state, loss = mle_step(params, opt_state)
    mle_loss = float(loss)

    bf = BayesianFlow(loglik, params, scale_max=0.01)
    cfg = ChEESConfig(
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=n_chains,
        seed=seed,
        init_step_size=0.02,
        max_leapfrogs=max_leapfrogs,
        steps_per_program=8,
    )
    q0 = bf.init_positions(jax.random.PRNGKey(seed + 4), n_chains, jitter=0.05)
    place = None
    if mesh is not None:
        q0 = jax.device_put(
            q0, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("chains"))
        )
        place = lambda s: shard_chees_state(s, mesh)  # noqa: E731

    if checkpoint_dir is not None:
        import dataclasses

        # leg 1: warm up, draw half, stop — the simulated preemption
        half = dataclasses.replace(cfg, num_samples=num_samples // 2)
        run_chees_checkpointed(
            bf.potential_centered, q0, half, checkpoint_dir,
            nbatch=max(1, num_samples // 4), place=place,
        )
        # leg 2: a "fresh process" resumes from disk and finishes
        out = run_chees_checkpointed(
            bf.potential_centered, q0, cfg, checkpoint_dir,
            nbatch=max(1, num_samples // 4), place=place,
        )
        samples = out["q"]
        accept = out["accept_prob"]
        wevals = int(out["warmup_num_grad_evals"])
        step_size = float(out["step_size"])
        traj_len = float(out["traj_len"])
    else:
        res = run_chees(bf.potential_centered, q0, cfg)
        samples = np.asarray(res["samples"])
        accept = np.asarray(res["sampling"]["accept_prob"])
        wevals = int(res["warmup"]["num_grad_evals"])
        step_size = float(res["step_size"])
        traj_len = float(res["traj_len"])

    # diagnostics on the standard projection: first 8 coordinates
    proj = jnp.asarray(samples[..., :8])
    return {
        "samples_shape": tuple(samples.shape),
        "proj_mean": np.asarray(proj.reshape(-1, proj.shape[-1]).mean(0)),
        "proj_std": np.asarray(proj.reshape(-1, proj.shape[-1]).std(0)),
        "split_rhat": np.asarray(split_rhat(proj)),
        "ess": np.asarray(effective_sample_size(proj)),
        "mean_accept": float(np.mean(accept)),
        "warmup_grad_evals": wevals,
        "step_size": step_size,
        "traj_len": traj_len,
        "mle_loss": mle_loss,
        "dim": int(q0.shape[-1]),
    }

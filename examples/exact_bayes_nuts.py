"""BASELINE config #5: exact Bayesian flow — NUTS over flow weights on the
2506.05657 population-synthesis emulation example, multi-chain, optionally
checkpointed, with coverage calibration.

Counterpart of ``/root/reference/examples/papers/2506.05657/hmc_maf_exact.py``
(CLI: --num-warmup --num-samples --sigma --fthin --chckpt) +
``calibrate.py``. With ``--h5`` it consumes the reference's
``CE_Bavera_2020.h5`` layout; otherwise it simulates an equivalent grid.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_population(rng, per_grid):
    grid = [(a, b) for a in np.linspace(0.0, 0.5, 4) for b in np.linspace(0.2, 1.0, 5)]
    held_out = grid.pop(7)
    thetas, lams = [], []
    for chi_b, alpha in grid:
        lam = np.tile([chi_b, alpha], (per_grid, 1)).astype(np.float32)
        m = np.stack(
            [1.2 + 0.8 * lam[:, 0], 0.1 + 0.3 * lam[:, 1] * lam[:, 0]], -1
        )
        s = np.array([0.25, 0.1]) * (1.0 + lam[:, :1])
        thetas.append((m + s * rng.standard_normal((per_grid, 2))).astype(np.float32))
        lams.append(lam)
    test_lam = np.asarray(held_out, np.float32)
    m = np.array([1.2 + 0.8 * held_out[0], 0.1 + 0.3 * held_out[1] * held_out[0]])
    s = np.array([0.25, 0.1]) * (1.0 + held_out[0])
    test_theta = (m + s * rng.standard_normal((per_grid * 5, 2))).astype(np.float32)
    return np.concatenate(thetas), np.concatenate(lams), test_theta, test_lam


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--h5", type=str, default=None, help="reference-layout dataset")
    p.add_argument("--per-grid", type=int, default=2000)
    p.add_argument("--fthin", type=int, default=1, help="dataset thinning")
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--hidden", type=int, nargs="+", default=[150, 150, 150])
    p.add_argument("--mle-epochs", type=int, default=300)
    p.add_argument("--num-warmup", type=int, default=200)
    p.add_argument("--num-samples", type=int, default=200)
    p.add_argument("--num-chains", type=int, default=4)
    p.add_argument("--sigma", type=float, default=0.01, help="scale_max")
    p.add_argument("--chckpt", type=str, default=None, help="checkpoint dir")
    p.add_argument("--calibrate", action="store_true")
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--steps-per-program", type=int, default=4,
                   help="MCMC transitions per device program (remote workers kill long executions)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--kernel", default="nuts", choices=["nuts", "chees"],
        help="chees = cross-chain adaptive HMC (lockstep chains; supports "
        "mixed precision via --compute-dtype bfloat16)",
    )
    p.add_argument("--compute-dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--max-leapfrogs", type=int, default=1024,
                   help="ChEES trajectory-length cap (leapfrogs per draw)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from naz_tpu.bayes import BayesianFlow, fit_nuts, make_flow_loglik
    from naz_tpu.config import FlowSpec
    from naz_tpu.mcmc.run import MCMCRunConfig
    from naz_tpu.stats import calibration_curve
    from naz_tpu.train import MLEConfig, train_mle

    if args.h5:
        from naz_tpu.data import load_training_h5

        d = load_training_h5(args.h5, thin=args.fthin)
        theta, lam = d["train_theta"], d["train_lambda"]
        test_theta, test_lam = d.get("test_theta"), d.get("test_lambda")
    else:
        rng = np.random.default_rng(args.seed)
        theta, lam, test_theta, test_lam = synth_population(rng, args.per_grid)
        theta, lam = theta[:: args.fthin], lam[:: args.fthin]
    print(f"training set: theta {theta.shape}, lambda {lam.shape}")

    cd = None if args.compute_dtype in (None, "float32") else args.compute_dtype
    spec = FlowSpec(
        flow_type="maf",
        dim=theta.shape[1],
        context_dim=lam.shape[1],
        n_layers=args.layers,
        hidden_dims=tuple(args.hidden),
        seed=args.seed,
        compute_dtype=cd,
    )
    flow = spec.build()
    import os as _os

    from naz_tpu.io.checkpoint import load_pytree, save_pytree

    mle_ckpt = (
        _os.path.join(args.chckpt, "mle_params.npz") if args.chckpt else None
    )
    if mle_ckpt and _os.path.exists(mle_ckpt):
        template = flow.init_params(jax.random.PRNGKey(args.seed))
        mle_params = load_pytree(mle_ckpt, template)
        print("loaded MLE params from checkpoint")
    else:
        mle = train_mle(
            flow,
            theta,
            context=lam,
            config=MLEConfig(
                lr=1e-3, max_epochs=args.mle_epochs, batch_frac=0.05, patience=64,
                verbose=True, sync_every=50,
            ),
        )
        print(f"MLE val NLL {mle.val_losses[-1]:.4f}")
        mle_params = mle.params
        if mle_ckpt:
            _os.makedirs(args.chckpt, exist_ok=True)
            save_pytree(mle_ckpt, mle_params)

    bf = BayesianFlow(
        make_flow_loglik(flow, theta, lam), mle_params, scale_max=args.sigma
    )
    print(f"model complexity: {bf.complexity}")

    cfg = MCMCRunConfig(
        num_warmup=args.num_warmup,
        num_samples=args.num_samples,
        num_chains=args.num_chains,
        max_depth=args.max_depth,
        steps_per_program=args.steps_per_program,
        seed=args.seed,
    )
    if args.kernel == "chees":
        import dataclasses as _dc

        from naz_tpu.bayes import fit_chees
        from naz_tpu.mcmc.chees import ChEESConfig

        fast_potential = None
        if cd is not None:
            # mixed precision: bf16 flow drives leapfrog gradients, the f32
            # twin supplies exact accept energies
            fast_potential = bf.potential
            flow32 = _dc.replace(spec, compute_dtype=None).build()
            bf = BayesianFlow(
                make_flow_loglik(flow32, theta, lam), mle_params,
                scale_max=args.sigma,
            )
        post = fit_chees(
            bf,
            ChEESConfig(
                num_warmup=args.num_warmup,
                num_samples=args.num_samples,
                num_chains=args.num_chains,
                seed=args.seed,
                steps_per_program=max(args.steps_per_program, 10),
                max_leapfrogs=args.max_leapfrogs,
                verbose=True,
            ),
            fast_potential=fast_potential,
            checkpoint_dir=args.chckpt,
        )
    else:
        post = fit_nuts(bf, cfg, checkpoint_dir=args.chckpt)
    d = post["diagnostics"]
    print(
        f"{args.kernel} done: accept {d['mean_accept_prob']:.3f}, divergences "
        f"{d['divergence_fraction']:.4f}, rhat {d['split_rhat'].round(3)}, "
        f"grad evals {d['total_grad_evals']}"
    )

    if args.calibrate and test_theta is not None:
        # thin posterior draws chains-first -> (draws, ...)
        params_draws = jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[2:])[:: max(1, args.num_samples // 64)],
            post["params"],
        )
        cs = np.linspace(0.1, 0.95, 10)
        cov = calibration_curve(
            flow,
            params_draws,
            test_theta,
            jax.random.PRNGKey(1),
            nq=25,
            cs=cs,
            n_samples=100_000,
            context=jnp.asarray(test_lam),
            fthin=4,
            draw_batch=16,
        )
        for c, e in zip(cs, np.asarray(cov)):
            print(f"  nominal {c:.2f} -> empirical {e:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

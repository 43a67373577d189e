"""BASELINE 4-param production config: conditional MAF 18 x [512]^5 on a
4-D population (theta = log m1, log m2, chi_eff, z | lambda = chi_b, alpha).

Counterpart of ``/root/reference/examples/papers/2506.05657/
train_mle_all_data_4param.py:87-118`` (arch 18 x [512]x5) and the eposydon
``train_maf_mle.py:26-95`` CLI (``--nhidden 512 --nlayer 5 --nflow 16
--fthin``). Defaults are CPU-runnable-small; ``--production`` switches to
the reference shape, where ``--use-pallas`` engages the per-layer fused
kernel (auto-planned tile; 1.55x over XLA f32 — PERFORMANCE.md) and
``--bayes --kernel chees`` runs the exact weight posterior.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_population(rng, per_grid, n_grid=19):
    """4-param synthetic analogue of the Bavera+2020 grid populations."""
    grid = [
        (a, b)
        for a in np.linspace(0.0, 0.5, 4)
        for b in np.linspace(0.2, 1.0, 5)
    ][:n_grid]
    thetas, lams = [], []
    for chi_b, alpha in grid:
        lam = np.tile([chi_b, alpha], (per_grid, 1)).astype(np.float32)
        logm1 = 3.0 + 0.5 * chi_b + 0.15 * rng.standard_normal(per_grid)
        logm2 = logm1 - 0.2 - 0.1 * alpha + 0.1 * rng.standard_normal(per_grid)
        chi_eff = 0.3 * chi_b + 0.05 * rng.standard_normal(per_grid)
        z = 0.5 + 0.3 * alpha + 0.2 * rng.standard_normal(per_grid)
        thetas.append(
            np.stack([logm1, logm2, chi_eff, z], -1).astype(np.float32)
        )
        lams.append(lam)
    return np.concatenate(thetas), np.concatenate(lams)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--h5", default=None, help="reference-layout 4-param dataset")
    p.add_argument("--per-grid", type=int, default=1000)
    p.add_argument("--fthin", type=int, default=1)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument(
        "--production", action="store_true",
        help="reference shape: 18 layers x [512]^5 (~19M weights)",
    )
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--compute-dtype", default=None, choices=[None, "bfloat16"])
    p.add_argument("--mle-epochs", type=int, default=200)
    p.add_argument("--batch-frac", type=float, default=0.2)
    p.add_argument("--bayes", action="store_true", help="exact weight posterior")
    p.add_argument("--kernel", default="chees", choices=["nuts", "chees"])
    p.add_argument("--num-warmup", type=int, default=100)
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--num-chains", type=int, default=4)
    p.add_argument("--sigma", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--outdir", default="__run_4param__")
    args = p.parse_args(argv)

    import jax
    from naz_tpu.data import load_training_h5
    from naz_tpu.flows import maf_flow
    from naz_tpu.io.checkpoint import save_pytree
    from naz_tpu.train import MLEConfig, train_mle

    if args.production:
        args.layers, args.hidden = 18, [512] * 5

    if args.h5:
        d = load_training_h5(args.h5, thin=args.fthin)
        theta = np.asarray(d["train_theta"], np.float32)
        lam = np.asarray(d["train_lambda"], np.float32)
    else:
        theta, lam = synth_population(
            np.random.default_rng(args.seed), args.per_grid
        )
        theta, lam = theta[:: args.fthin], lam[:: args.fthin]
    print(f"training set: {theta.shape[0]} x theta{theta.shape[1:]} | "
          f"lambda{lam.shape[1:]}")

    flow = maf_flow(
        theta.shape[1],
        n_layers=args.layers,
        hidden_dims=tuple(args.hidden),
        context_dim=lam.shape[1],
        seed=args.seed,
        use_pallas=args.use_pallas,
        compute_dtype=args.compute_dtype,
    )
    res = train_mle(
        flow, theta, context=lam,
        config=MLEConfig(
            lr=1e-3, max_epochs=args.mle_epochs, batch_frac=args.batch_frac,
            patience=64, verbose=True,
        ),
    )
    os.makedirs(args.outdir, exist_ok=True)
    save_pytree(os.path.join(args.outdir, "mle_4param.npz"), res.params)
    n_weights = sum(x.size for x in jax.tree.leaves(res.params))
    print(f"MLE done: val NLL {float(res.val_losses[-1]):.4f}, "
          f"{n_weights} weights -> {args.outdir}/mle_4param.npz")

    if not args.bayes:
        return 0

    from naz_tpu.bayes import BayesianFlow, fit_chees, fit_nuts, make_flow_loglik
    from naz_tpu.mcmc.chees import ChEESConfig
    from naz_tpu.mcmc.run import MCMCRunConfig

    bf = BayesianFlow(
        make_flow_loglik(flow, theta, lam), res.params, scale_max=args.sigma
    )
    print(f"model complexity: {bf.complexity}")
    if args.kernel == "chees":
        post = fit_chees(
            bf,
            ChEESConfig(
                num_warmup=args.num_warmup, num_samples=args.num_samples,
                num_chains=args.num_chains, seed=args.seed,
            ),
        )
    else:
        post = fit_nuts(
            bf,
            MCMCRunConfig(
                num_warmup=args.num_warmup, num_samples=args.num_samples,
                num_chains=args.num_chains, seed=args.seed,
            ),
        )
    np.savez(
        os.path.join(args.outdir, "post_4param.npz"),
        params_flat=np.asarray(post["params_flat"]),
        log_likelihood=np.asarray(post["log_likelihood"]),
    )
    diag = post["diagnostics"]
    print({k: (np.asarray(v).tolist() if hasattr(v, "shape") else v)
           for k, v in diag.items() if k in ("divergence_fraction",
                                             "mean_accept_prob")})
    print(f"posterior -> {args.outdir}/post_4param.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())

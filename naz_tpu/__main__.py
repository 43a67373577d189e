"""CLI: ``python -m naz_tpu <command>``.

Replaces the reference's copy-pasted per-script argparse blocks
(``/root/reference/examples/papers/2506.05657/hmc_maf_exact.py:33-52`` etc.)
with one entry point over the library. Data files use the reference h5
layout (``train_theta/train_lambda/...``).
"""

import argparse
import json
import sys

import numpy as np


def _add_flow_args(p):
    p.add_argument("--flow-type", default="maf", choices=["maf", "nsa", "nsc", "cnf"])
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--hidden", type=int, nargs="+", default=[150, 150, 150])
    p.add_argument("--count-bins", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)


def _load(args):
    from naz_tpu.data import load_training_h5

    d = load_training_h5(args.data, thin=args.fthin)
    theta = d["train_theta"].astype(np.float32)
    lam = d.get("train_lambda")
    if lam is not None:
        lam = lam.astype(np.float32)
    return theta, lam, d


def _build_flow(args, theta, lam):
    from naz_tpu.config import FlowSpec

    return FlowSpec(
        flow_type=args.flow_type,
        dim=theta.shape[1],
        context_dim=0 if lam is None else lam.shape[1],
        n_layers=args.layers,
        hidden_dims=tuple(args.hidden),
        count_bins=args.count_bins,
        dropout_rate=args.dropout,
        seed=args.seed,
    ).build()


def main(argv=None):
    p = argparse.ArgumentParser(prog="naz_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    tp = sub.add_parser("train-mle", help="maximum-likelihood flow fit")
    _add_flow_args(tp)
    tp.add_argument("--data", required=True)
    tp.add_argument("--fthin", type=int, default=1)
    tp.add_argument("--epochs", type=int, default=8192)
    tp.add_argument("--lr", type=float, default=1e-3)
    tp.add_argument("--min-lr", type=float, default=1e-9)
    tp.add_argument("--batch-frac", type=float, default=0.05)
    tp.add_argument("--patience", type=int, default=64)
    tp.add_argument("--out", required=True, help="params checkpoint (.npz)")

    hp = sub.add_parser("hmc", help="exact Bayesian NUTS over flow weights")
    _add_flow_args(hp)
    hp.add_argument("--data", required=True)
    hp.add_argument("--fthin", type=int, default=1)
    hp.add_argument("--mle-params", required=True)
    hp.add_argument("--num-warmup", type=int, default=1000)
    hp.add_argument("--num-samples", type=int, default=1000)
    hp.add_argument("--num-chains", type=int, default=4)
    hp.add_argument("--sigma", type=float, default=1.0, help="scale_max")
    hp.add_argument("--prior", default="uniform")
    hp.add_argument("--chckpt", default=None, help="checkpoint dir (resumable)")
    hp.add_argument("--out", required=True, help="posterior output (.npz)")

    sp = sub.add_parser("svi", help="variational posterior + IS evidence")
    _add_flow_args(sp)
    sp.add_argument("--data", required=True)
    sp.add_argument("--fthin", type=int, default=1)
    sp.add_argument("--mle-params", required=True)
    sp.add_argument("--num-steps", type=int, default=7000)
    sp.add_argument("--step-size", type=float, default=5e-3)
    sp.add_argument("--sigma", type=float, default=1.0)
    sp.add_argument("--num-particles", type=int, default=1)
    sp.add_argument("--evidence-samples", type=int, default=1000)
    sp.add_argument("--out", required=True)

    args = p.parse_args(argv)

    import jax
    from naz_tpu.io.checkpoint import load_pytree, save_pytree

    if args.cmd == "train-mle":
        from naz_tpu.train import MLEConfig, train_mle

        theta, lam, _ = _load(args)
        flow = _build_flow(args, theta, lam)
        res = train_mle(
            flow,
            theta,
            context=lam,
            config=MLEConfig(
                lr=args.lr,
                min_lr=args.min_lr,
                max_epochs=args.epochs,
                batch_frac=args.batch_frac,
                patience=args.patience,
                dropout=args.dropout > 0,
                verbose=True,
            ),
        )
        save_pytree(args.out, res.params)
        print(
            json.dumps(
                {
                    "val_nll": float(res.val_losses[-1]),
                    "epochs": int(res.epochs_run),
                    "out": args.out,
                }
            )
        )
        return 0

    theta, lam, _ = _load(args)
    flow = _build_flow(args, theta, lam)
    template = flow.init_params(jax.random.PRNGKey(args.seed))
    mle_params = load_pytree(args.mle_params, template)

    from naz_tpu.bayes import BayesianFlow, make_flow_loglik

    bf = BayesianFlow(
        make_flow_loglik(flow, theta, lam),
        mle_params,
        scale_max=args.sigma,
        prior=getattr(args, "prior", "uniform"),
    )
    print(f"model complexity: {bf.complexity}")

    if args.cmd == "hmc":
        from naz_tpu.bayes import fit_nuts
        from naz_tpu.mcmc.run import MCMCRunConfig

        post = fit_nuts(
            bf,
            MCMCRunConfig(
                num_warmup=args.num_warmup,
                num_samples=args.num_samples,
                num_chains=args.num_chains,
                seed=args.seed,
            ),
            checkpoint_dir=args.chckpt,
        )
        np.savez(
            args.out,
            params_flat=np.asarray(post["params_flat"]),
            log_likelihood=np.asarray(post["log_likelihood"]),
        )
        print(json.dumps({k: v.tolist() if hasattr(v, "tolist") else v
                          for k, v in post["diagnostics"].items()}))
        return 0

    if args.cmd == "svi":
        from naz_tpu.bayes import (
            SVIConfig,
            fit_svi,
            importance_evidence,
            sample_svi_posterior,
        )

        svi = fit_svi(
            bf,
            SVIConfig(
                num_steps=args.num_steps,
                step_size=args.step_size,
                num_particles=args.num_particles,
                seed=args.seed,
                verbose=True,
            ),
        )
        ev = importance_evidence(
            bf, svi, jax.random.PRNGKey(args.seed), num_samples=args.evidence_samples
        )
        draws = sample_svi_posterior(bf, svi, jax.random.PRNGKey(args.seed + 1), 1000)
        np.savez(
            args.out,
            params_flat=np.asarray(draws["params_flat"]),
            mu=np.asarray(svi.guide_params["mu"]),
            sigma=np.asarray(svi.guide_params["sigma"]),
            losses=svi.losses,
        )
        print(
            json.dumps(
                {
                    "final_neg_elbo": float(svi.losses[-1]),
                    "log_evidence": ev.log_evidence,
                    "log_evidence_se": ev.log_evidence_se,
                    "is_ess": ev.ess,
                }
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

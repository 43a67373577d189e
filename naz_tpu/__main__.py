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
    p.add_argument(
        "--compute-dtype", default=None, choices=[None, "float32", "bfloat16"],
        help="MAF conditioner matmul dtype; bfloat16 halves hot-path HBM "
        "bytes (~1.9x at production scale). With --kernel chees the accept "
        "energies stay f32 (mixed precision), so the posterior is exact.",
    )
    p.add_argument(
        "--use-pallas", action="store_true",
        help="fused Pallas density kernels for MAF (auto whole-stack vs "
        "per-layer by VMEM fit; 1.5x over XLA f32 at the 4-param "
        "production shape — PERFORMANCE.md)",
    )
    p.add_argument(
        "--scan-unroll", type=int, default=1,
        help="unroll factor for the MAF layer scan: static layer indices "
        "let XLA fuse the backward's per-layer dW updates and carry "
        "copies (PERF_PROFILE.json); set to --layers for full unroll",
    )
    p.add_argument(
        "--bounds-low", type=float, nargs="+", default=None,
        help="lower box bounds per dim (logit-box bounded support, "
        "e.g. the unsupervised GW170817 fit train_mle_unsupervised.py)",
    )
    p.add_argument(
        "--bounds-high", type=float, nargs="+", default=None,
        help="upper box bounds per dim",
    )


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

    bounds = None
    if (args.bounds_low is None) != (args.bounds_high is None):
        raise SystemExit("--bounds-low and --bounds-high must be given together")
    if args.bounds_low is not None:
        if not (len(args.bounds_low) == len(args.bounds_high) == theta.shape[1]):
            raise SystemExit(
                f"bounds must have one value per dim (dim={theta.shape[1]})"
            )
        bounds = (tuple(args.bounds_low), tuple(args.bounds_high))
    cd = getattr(args, "compute_dtype", None)
    return FlowSpec(
        flow_type=args.flow_type,
        dim=theta.shape[1],
        context_dim=0 if lam is None else lam.shape[1],
        n_layers=args.layers,
        hidden_dims=tuple(args.hidden),
        count_bins=args.count_bins,
        dropout_rate=args.dropout,
        bounds=bounds,
        seed=args.seed,
        compute_dtype=None if cd in (None, "float32") else cd,
        use_pallas=getattr(args, "use_pallas", False),
        scan_unroll=getattr(args, "scan_unroll", 1),
    ).build()


def _even_thin(pf, max_draws):
    """Thin posterior draws evenly across the whole chain (a prefix or
    strided prefix would over-weight the most warmup-correlated draws)."""
    pf = np.asarray(pf)
    pf = pf.reshape(-1, pf.shape[-1])
    if len(pf) > max_draws:
        idx = np.linspace(0, len(pf) - 1, max_draws).astype(int)
        pf = pf[idx]
    return pf


def _posterior_setup(args, thin=1, context_index=0):
    """Shared calibrate/predict/plot setup: held-out data, conditioning
    context, flow and its unravel fn."""
    import jax
    from jax.flatten_util import ravel_pytree
    from naz_tpu.data import load_training_h5

    d = load_training_h5(args.data, thin=thin)
    theta_true = np.asarray(d.get("test_theta", d["train_theta"]), dtype=np.float32)
    lam = d.get("test_lambda", d.get("train_lambda"))
    # the reference conditions the PPD on the held-out grid point
    # (calibrate.py:144-150) — one lambda row
    context = None if lam is None else np.asarray(lam, np.float32)[context_index]
    flow = _build_flow(
        args, theta_true, None if context is None else context[None, :]
    )
    template = flow.init_params(jax.random.PRNGKey(args.seed))
    _, unravel = ravel_pytree(template)
    return theta_true, context, flow, template, unravel


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

    ep = sub.add_parser(
        "train-ensemble",
        help="aleatoric bootstrap MLE ensemble (train_mle_aleatoric.py)",
    )
    _add_flow_args(ep)
    ep.add_argument("--data", required=True)
    ep.add_argument("--fthin", type=int, default=10, help="subsample factor per member")
    ep.add_argument("--members", type=int, default=8)
    ep.add_argument(
        "--resample", default="thin", choices=["thin", "bootstrap", "none"]
    )
    ep.add_argument(
        "--vmapped", action="store_true",
        help="train all members in one vmapped program (small flows)",
    )
    ep.add_argument(
        "--shared-subsample", action="store_true",
        help="all members see the same subsample (reference behavior: "
        "only training randomness varies)",
    )
    ep.add_argument("--epochs", type=int, default=8192)
    ep.add_argument("--lr", type=float, default=1e-3)
    ep.add_argument("--min-lr", type=float, default=1e-9)
    ep.add_argument("--batch-frac", type=float, default=0.1)
    ep.add_argument("--patience", type=int, default=64)
    ep.add_argument("--out", required=True, help="stacked params checkpoint (.npz)")

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
    hp.add_argument(
        "--free-scale", action="store_true",
        help="sample scale ~ U(0, sigma) instead of fixing it at sigma "
        "(reference fixed_scale=False, bflow_jax_maf.py:238)",
    )
    hp.add_argument(
        "--multi-scale", action="store_true",
        help="with --free-scale: one scale per weight (doubles the "
        "sampling dimension, reference multi_scale=True)",
    )
    hp.add_argument(
        "--chain-exec", default="map", choices=["map", "vmap"],
        help="chain execution: sequential 'map' (faster at production "
        "scale, the default) or batched 'vmap' (faster for small models)",
    )
    hp.add_argument("--chckpt", default=None, help="checkpoint dir (resumable)")
    hp.add_argument(
        "--nbatch", type=int, default=100,
        help="with --chckpt: draws per checkpoint batch (state + posterior "
        "land on disk after every batch; a killed run resumes exactly)",
    )
    hp.add_argument(
        "--kernel", default="nuts", choices=["nuts", "hmc", "chees"],
        help="transition kernel: NUTS (default), fixed-length HMC, or "
        "ChEES-HMC (cross-chain adaptive trajectories; best with many "
        "vmapped chains; supports --chckpt)",
    )
    hp.add_argument(
        "--steps-per-program", type=int, default=8,
        help="MCMC transitions per device program. Remote TPU workers kill "
        "programs that run longer than a few minutes; at production scale "
        "(190k points) early-warmup trajectories can hit the leapfrog cap, "
        "so keep chunks small (worst-case chunk cost ~ this x chains x "
        "max-leapfrogs x ms/grad)",
    )
    hp.add_argument(
        "--max-leapfrogs", type=int, default=256,
        help="hard cap on leapfrog steps per ChEES trajectory (chees only; "
        "NUTS uses 2^--max-depth)",
    )
    hp.add_argument(
        "--warmup-max-leapfrogs", type=int, default=0,
        help="chees only: separate leapfrog cap for the warmup phase "
        "(0 = use --max-leapfrogs). Warmup cost scales with this budget "
        "and T still adapts above the cap, so production runs use a tight "
        "warmup cap (~96) with full-length --max-leapfrogs sampling",
    )
    hp.add_argument(
        "--min-leapfrogs", type=int, default=1,
        help="floor on leapfrog steps per ChEES trajectory (and on T via "
        "the adaptation clip) — guards against trajectory-length collapse "
        "freezing the chains (chees only)",
    )
    hp.add_argument(
        "--leapfrogs-per-program", type=int, default=0,
        help="split each ChEES trajectory (warmup AND sampling) across "
        "device programs of at most this many leapfrog steps (0 = whole "
        "trajectory per program). Lets --max-leapfrogs reach the adapted "
        "T/eps under a program-runtime watchdog: carries stay on-device "
        "between dispatches, one dynamic-trip-count executable serves "
        "every chunk size (chees only)",
    )
    hp.add_argument(
        "--out-thin", type=int, default=1,
        help="keep every Nth draw's weights in the output posterior "
        "(diagnostics and the log-likelihood trace always use all draws); "
        "at production scale full weight posteriors are tens of GB",
    )
    hp.add_argument(
        "--thin-draws", type=int, default=1,
        help="chees only: thin the full weight vectors ON DEVICE during "
        "sampling — keep every Nth draw's positions, stream only scalar "
        "diagnostics (exact energy, first-8 coords) per draw. At "
        "production scale the remote device->host link is the sampling "
        "bottleneck (~76 MB/draw at 19M weights); R-hat/ESS use the full "
        "scalar traces either way",
    )
    hp.add_argument(
        "--curvature-init-mass", action="store_true",
        help="initialize the diagonal mass matrix from Hutchinson curvature "
        "probes at the MLE (chees only) — shortens warmup; adaptation "
        "still refines it",
    )
    hp.add_argument(
        "--warm-start", default=None, metavar="CKPT",
        help="chees only: seed eps/T/mass from a previous run's checkpoint "
        "(dir or chees_state.npz) — e.g. the adjacent sigma0 in a prior-"
        "scale sweep. Warmup still probes and window-adapts for THIS "
        "posterior; only the cold identity-mass crawl is skipped. Ignored "
        "when resuming an existing --chckpt",
    )
    hp.add_argument(
        "--warm-start-sigma", type=float, default=None, metavar="S_PREV",
        help="the --sigma of the run --warm-start points at: rescales the "
        "warm-started mass by (S_PREV/sigma)^2 and the step size by "
        "S_PREV/sigma (standardized-space likelihood curvature scales as "
        "sigma0^2, so an unscaled cross-sigma warm start re-pays most of "
        "the cold crawl)",
    )
    hp.add_argument("--max-depth", type=int, default=10, help="NUTS tree depth cap")
    hp.add_argument(
        "--trace", default=None,
        help="capture a jax.profiler device trace of the run into this "
        "directory (TensorBoard/Perfetto)",
    )
    hp.add_argument("--out", required=True, help="posterior output (.npz)")

    sp = sub.add_parser("svi", help="variational posterior + IS evidence")
    _add_flow_args(sp)
    sp.add_argument("--data", required=True)
    sp.add_argument("--fthin", type=int, default=1)
    sp.add_argument("--mle-params", required=True)
    sp.add_argument("--num-steps", type=int, default=7000)
    sp.add_argument("--step-size", type=float, default=5e-3)
    sp.add_argument("--sigma", type=float, default=1.0)
    sp.add_argument("--prior", default="uniform")
    sp.add_argument(
        "--free-scale", action="store_true",
        help="learn a guide over scale ~ U(0, sigma) (fixed_scale=False)",
    )
    sp.add_argument(
        "--multi-scale", action="store_true",
        help="with --free-scale: per-weight scale guide",
    )
    sp.add_argument("--num-particles", type=int, default=1)
    sp.add_argument("--evidence-samples", type=int, default=1000)
    sp.add_argument(
        "--evidence-batch", type=int, default=None,
        help="IS draws per device batch (production scale: each draw's "
        "likelihood streams the full training set — batch ~8 keeps the "
        "vmapped activations inside HBM)",
    )
    sp.add_argument(
        "--posterior-draws", type=int, default=1000,
        help="guide draws saved to --out (production scale: the flat "
        "draws are draws x P floats of device->host traffic — 128 is "
        "plenty for calibration/comparison consumers)",
    )
    sp.add_argument("--out", required=True)

    vp = sub.add_parser(
        "evidence",
        help="stepping-stone/TI log-evidence over power posteriors "
        "(stable where the reference's prior-proposal IS collapses)",
    )
    _add_flow_args(vp)
    vp.add_argument("--data", required=True)
    vp.add_argument("--fthin", type=int, default=1)
    vp.add_argument("--mle-params", required=True)
    vp.add_argument("--sigma", type=float, default=1.0)
    vp.add_argument("--prior", default="uniform")
    vp.add_argument("--n-temps", type=int, default=16)
    vp.add_argument("--num-warmup", type=int, default=300)
    vp.add_argument("--num-samples", type=int, default=100)
    vp.add_argument("--num-chains", type=int, default=4)
    vp.add_argument(
        "--chain-exec", default="map", choices=["map", "vmap"],
        help="chain execution per rung: sequential 'map' (production "
        "scale — one chain saturates the chip) or batched 'vmap' (small "
        "models)",
    )
    vp.add_argument(
        "--steps-per-program", type=int, default=8,
        help="MCMC transitions per device program (see hmc --steps-per-program)",
    )
    vp.add_argument("--max-depth", type=int, default=8, help="NUTS tree depth cap")
    vp.add_argument("--out", default=None, help="optional JSON output path")

    cp = sub.add_parser(
        "calibrate",
        help="posterior-predictive coverage curves (reference calibrate.py)",
    )
    _add_flow_args(cp)
    cp.add_argument("--data", required=True, help="h5 with test_theta/test_lambda")
    cp.add_argument("--posterior", required=True, help="npz from `hmc`/`svi`")
    cp.add_argument("--nq", type=int, nargs="+", default=[25, 49, 100, 400])
    cp.add_argument("--cs", type=float, nargs=3, default=[0.1, 0.95, 10],
                    metavar=("START", "STOP", "NUM"))
    cp.add_argument("--n-samples", type=int, default=1_000_000,
                    help="PPD samples per posterior draw")
    cp.add_argument("--max-draws", type=int, default=256)
    cp.add_argument("--fthin", type=int, default=10, help="bootstrap rounds")
    cp.add_argument("--itype", default="hpd", choices=["hpd", "eqt"])
    cp.add_argument("--draw-batch", type=int, default=16)
    cp.add_argument("--out", required=True, help="output prefix (txt + png per nq)")

    pp = sub.add_parser(
        "predict",
        help="posterior-predictive sample generation (reference predict, "
        "train_flows.py:384-422; prior-predictive via --prior-draws, "
        "bflow_jax_maf.py:337-341)",
    )
    _add_flow_args(pp)
    pp.add_argument("--data", required=True)
    pp.add_argument("--fthin", type=int, default=1)
    pp.add_argument("--posterior", default=None, help="npz from `hmc`/`svi`")
    pp.add_argument(
        "--prior-draws", type=int, default=0,
        help="also draw this many weight-PRIOR realizations "
        "(needs --mle-params to center the prior)",
    )
    pp.add_argument("--mle-params", default=None)
    pp.add_argument("--sigma", type=float, default=1.0)
    pp.add_argument("--prior", default="uniform")
    pp.add_argument("--n-samples", type=int, default=100_000,
                    help="flow samples per draw (reference uses 1e6)")
    pp.add_argument("--max-draws", type=int, default=256)
    pp.add_argument("--draw-batch", type=int, default=16)
    pp.add_argument(
        "--context-index", type=int, default=0,
        help="row of test_lambda (or train_lambda) to condition on",
    )
    pp.add_argument("--out", required=True,
                    help="npz with ppd (n_draws, n_samples, dim)")

    lp = sub.add_parser(
        "plot",
        help="marginal HPD bands (prior vs posterior vs truth) + 90%% "
        "contours (reference plot.py / plot_svi.py:181-305)",
    )
    _add_flow_args(lp)
    lp.add_argument("--data", required=True)
    lp.add_argument("--fthin", type=int, default=1)
    lp.add_argument("--posterior", required=True)
    lp.add_argument("--prior-draws", type=int, default=0,
                    help="overlay prior-predictive bands (needs --mle-params)")
    lp.add_argument("--mle-params", default=None)
    lp.add_argument("--sigma", type=float, default=1.0)
    lp.add_argument("--prior", default="uniform")
    lp.add_argument("--n-samples", type=int, default=100_000)
    lp.add_argument("--max-draws", type=int, default=128)
    lp.add_argument("--draw-batch", type=int, default=16)
    lp.add_argument("--grid-bins", type=int, default=60)
    lp.add_argument("--credibility", type=float, default=0.9)
    lp.add_argument("--context-index", type=int, default=0)
    lp.add_argument("--out", required=True, help="output prefix (png per dim)")

    bp = sub.add_parser("bic", help="BIC from a posterior run (compute_bic_simpler)")
    bp.add_argument("--data", required=True)
    bp.add_argument("--fthin", type=int, default=1)
    bp.add_argument("--posterior", required=True, help="npz with log_likelihood")
    bp.add_argument("--out", default=None, help="optional JSON output path")

    kp = sub.add_parser(
        "kde-bands",
        help="per-draw KDE pdfs of one PPD feature + HPD uncertainty band "
        "(the reference's bayesian_amplification_kde.ipynb analysis: "
        "scipy KDE per draw -> trapz-normalize -> HPD fill-between)",
    )
    kp.add_argument("--ppd", required=True,
                    help="npz from `predict` (key ppd, (draws, samples, dim))")
    kp.add_argument("--feature", type=int, default=0,
                    help="feature column to marginalize onto")
    kp.add_argument("--grid", type=float, nargs=3, default=None,
                    metavar=("START", "STOP", "NUM"),
                    help="evaluation grid (default: data range, 100 points)")
    kp.add_argument("--lo", type=float, default=None,
                    help="reflect KDE mass at this lower bound")
    kp.add_argument("--hi", type=float, default=None,
                    help="reflect KDE mass at this upper bound")
    kp.add_argument("--alpha", type=float, default=0.1,
                    help="HPD band level (0.1 -> 90%% band)")
    kp.add_argument("--max-draws", type=int, default=512)
    kp.add_argument("--data", default=None,
                    help="optional h5; overlays a KDE of test_theta truth")
    kp.add_argument("--out", required=True, help="output prefix (txt + png)")

    args = p.parse_args(argv)

    if args.cmd == "calibrate":
        import jax
        from naz_tpu.stats.calibrate import calibration_curve
        from naz_tpu.stats.plotting import plot_calibration

        theta_true, context, flow, _, unravel = _posterior_setup(args)
        pf = _even_thin(np.load(args.posterior)["params_flat"], args.max_draws)
        params_draws = jax.vmap(unravel)(jax.numpy.asarray(pf))

        cs = np.linspace(args.cs[0], args.cs[1], int(args.cs[2]))
        results = {}
        for nq in args.nq:
            cov = calibration_curve(
                flow,
                params_draws,
                theta_true,
                jax.random.PRNGKey(args.seed),
                nq,
                cs,
                n_samples=args.n_samples,
                context=context,
                fthin=args.fthin,
                itype=args.itype,
                draw_batch=args.draw_batch,
            )
            cov = np.asarray(cov)
            results[nq] = cov
            np.savetxt(
                f"{args.out}_nq{nq}.txt",
                np.stack([cs, cov], axis=1),
                header="credibility empirical_coverage",
            )
            try:
                ax = plot_calibration(cs, cov, labels=[f"nq={nq}"])
                ax.figure.savefig(f"{args.out}_nq{nq}.png", dpi=120)
            except ImportError as e:  # matplotlib optional
                print(f"plot skipped: {e}", file=sys.stderr)
        print(
            json.dumps(
                {str(nq): np.round(c, 4).tolist() for nq, c in results.items()}
            )
        )
        return 0

    if args.cmd in ("predict", "plot"):
        import jax
        from naz_tpu.io.checkpoint import load_pytree
        from naz_tpu.stats.calibrate import posterior_predictive

        theta_true, context, flow, template, unravel = _posterior_setup(
            args, thin=args.fthin, context_index=args.context_index
        )
        key = jax.random.PRNGKey(args.seed)

        post_ppd = prior_ppd = None
        if args.posterior:
            pf = _even_thin(np.load(args.posterior)["params_flat"], args.max_draws)
            params_draws = jax.vmap(unravel)(jax.numpy.asarray(pf))
            post_ppd = np.asarray(
                posterior_predictive(
                    flow, params_draws, key, args.n_samples,
                    context=context, draw_batch=args.draw_batch,
                )
            )
        if args.prior_draws > 0:
            if args.mle_params is None:
                raise SystemExit("--prior-draws needs --mle-params")
            from naz_tpu.bayes import BayesianFlow, make_flow_loglik

            mle = load_pytree(args.mle_params, template)
            bf = BayesianFlow(
                make_flow_loglik(
                    flow, theta_true[:1],
                    None if context is None else context[None, :],
                ),
                mle, scale_max=args.sigma, prior=args.prior,
            )
            pr = bf.sample_prior(
                jax.random.PRNGKey(args.seed + 1), args.prior_draws
            )
            prior_ppd = np.asarray(
                posterior_predictive(
                    flow, pr["params"], jax.random.PRNGKey(args.seed + 2),
                    args.n_samples, context=context,
                    draw_batch=args.draw_batch,
                )
            )

        if args.cmd == "predict":
            out = {}
            if post_ppd is not None:
                out["ppd"] = post_ppd
            if prior_ppd is not None:
                out["prior_ppd"] = prior_ppd
            if not out:
                raise SystemExit("predict needs --posterior and/or --prior-draws")
            np.savez(args.out, **out)
            print(
                json.dumps(
                    {k: list(v.shape) for k, v in out.items()} | {"out": args.out}
                )
            )
            return 0

        # ---- plot ----
        if post_ppd is None:
            raise SystemExit("plot needs --posterior")
        from naz_tpu.stats.plotting import (
            marginal_density_draws,
            plot_contour_level,
            plot_marginal_bands,
        )

        dim = theta_true.shape[1]
        edges = [
            np.linspace(
                theta_true[:, j].min(), theta_true[:, j].max(),
                args.grid_bins + 1,
            )
            for j in range(dim)
        ]
        centers = [0.5 * (e[1:] + e[:-1]) for e in edges]
        truth = [
            np.histogram(theta_true[:, j], bins=edges[j], density=True)[0]
            for j in range(dim)
        ]
        post_marg = marginal_density_draws(post_ppd, edges)
        prior_marg = (
            None if prior_ppd is None
            else marginal_density_draws(prior_ppd, edges)
        )

        written = []
        try:
            for j in range(dim):
                ax = plot_marginal_bands(
                    centers[j], post_marg[j], truth_pdf=truth[j],
                    credibility=args.credibility,
                )
                if prior_marg is not None:
                    plot_marginal_bands(
                        centers[j], prior_marg[j], ax=ax,
                        credibility=args.credibility,
                        label="prior", color="C1",
                    )
                ax.set_xlabel(f"theta[{j}]")
                ax.set_ylabel("density")
                f = f"{args.out}_marginal{j}.png"
                ax.figure.savefig(f, dpi=120)
                written.append(f)
            if dim == 2:
                # per-draw 2-D histogram densities -> median density map;
                # overlay its level contour vs the truth histogram's.
                # Normalize by TOTAL draw count (not density=True, which
                # renormalizes over in-range mass only and inflates draws
                # whose mass falls outside the truth's range).
                area = np.outer(np.diff(edges[0]), np.diff(edges[1]))
                hists = np.stack(
                    [
                        np.histogram2d(
                            s[:, 0], s[:, 1], bins=[edges[0], edges[1]]
                        )[0]
                        / (len(s) * area)
                        for s in post_ppd
                    ]
                )
                med = np.median(hists, axis=0)
                truth2d = np.histogram2d(
                    theta_true[:, 0], theta_true[:, 1],
                    bins=[edges[0], edges[1]], density=True,
                )[0]
                X, Y = np.meshgrid(centers[0], centers[1], indexing="ij")
                ax = plot_contour_level(
                    X, Y, med, mass=args.credibility, colors="C0",
                )
                plot_contour_level(
                    X, Y, truth2d, mass=args.credibility, ax=ax, colors="k",
                    linestyles="dashed",
                )
                ax.set_xlabel("theta[0]")
                ax.set_ylabel("theta[1]")
                f = f"{args.out}_contour.png"
                ax.figure.savefig(f, dpi=120)
                written.append(f)
        except ImportError as e:  # matplotlib optional
            print(f"plot skipped: {e}", file=sys.stderr)
        print(json.dumps({"written": written}))
        return 0

    if args.cmd == "bic":
        from naz_tpu.data import load_training_h5
        from naz_tpu.stats.model_comparison import compute_bic

        d = load_training_h5(args.data, thin=args.fthin)
        n_data = len(d["train_theta"])
        post = np.load(args.posterior)
        log_ls = np.asarray(post["log_likelihood"]).reshape(-1)
        complexity = int(np.asarray(post["params_flat"]).shape[-1])
        bic = float(compute_bic(log_ls, n_data, complexity))
        out = {
            "bic": bic,
            "complexity": complexity,
            "n_data": n_data,
            "max_log_l": float(np.max(log_ls)),
        }
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f)
        print(json.dumps(out))
        return 0

    if args.cmd == "kde-bands":
        from naz_tpu.stats import gaussian_kde_pdf, ppd_kde_bands

        ppd = np.load(args.ppd)["ppd"]  # (draws, samples, dim)
        feat = ppd[..., args.feature]
        if len(feat) > args.max_draws:
            idx = np.linspace(0, len(feat) - 1, args.max_draws).astype(int)
            feat = feat[idx]
        if args.grid is not None:
            grid = np.linspace(args.grid[0], args.grid[1], int(args.grid[2]))
        else:
            lo = args.lo if args.lo is not None else feat.min()
            hi = args.hi if args.hi is not None else feat.max()
            grid = np.linspace(lo, hi, 100)
        pdfs, band = ppd_kde_bands(
            feat, grid, alpha=args.alpha, lo=args.lo, hi=args.hi
        )
        med = np.median(pdfs, axis=0)
        cols = [grid, band[0], band[1], med]
        header = "grid band_lo band_hi median"
        truth_pdf = None
        if args.data:
            from naz_tpu.data import load_training_h5

            d = load_training_h5(args.data)
            truth = np.asarray(
                d.get("test_theta", d["train_theta"])
            )[:, args.feature]
            truth_pdf = np.asarray(gaussian_kde_pdf(grid, truth))
            truth_pdf = truth_pdf / np.trapezoid(truth_pdf, grid)
            cols.append(truth_pdf)
            header += " truth"
        np.savetxt(f"{args.out}_kde.txt", np.stack(cols, axis=1), header=header)
        written = [f"{args.out}_kde.txt"]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(8, 5))
            ax.fill_between(
                grid, band[0], band[1], alpha=0.25, color="C2",
                label=f"augmentation with UQ ({100 * (1 - args.alpha):.0f}% HPD)",
            )
            ax.plot(grid, med, color="C2", label="PPD median")
            if truth_pdf is not None:
                ax.plot(grid, truth_pdf, "k--", label="truth KDE")
            ax.set_xlabel(f"theta[{args.feature}]")
            ax.set_ylabel("density")
            ax.legend()
            f = f"{args.out}_kde.png"
            fig.savefig(f, dpi=120)
            written.append(f)
        except ImportError as e:  # matplotlib optional
            print(f"plot skipped: {e}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "written": written,
                    "n_draws": int(pdfs.shape[0]),
                    "band_mean_width": float(np.mean(band[1] - band[0])),
                }
            )
        )
        return 0

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

    if args.cmd == "train-ensemble":
        from naz_tpu.train import EnsembleConfig, MLEConfig, train_mle_ensemble

        # the ensemble owns the fthin subsampling (per member); load in full
        fthin, args.fthin = args.fthin, 1
        theta, lam, _ = _load(args)
        flow = _build_flow(args, theta, lam)
        res = train_mle_ensemble(
            flow,
            theta,
            context=lam,
            config=EnsembleConfig(
                n_members=args.members,
                fthin=fthin,
                shared_subsample=args.shared_subsample,
                resample=args.resample,
                vmapped=args.vmapped,
                mle=MLEConfig(
                    lr=args.lr,
                    min_lr=args.min_lr,
                    max_epochs=args.epochs,
                    batch_frac=args.batch_frac,
                    patience=args.patience,
                    dropout=args.dropout > 0,
                ),
            ),
        )
        save_pytree(args.out, res.params)
        print(
            json.dumps(
                {
                    "members": args.members,
                    "val_nll": [float(v) for v in res.val_losses],
                    "epochs": [int(e) for e in res.epochs_run],
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
        fixed_scale=not getattr(args, "free_scale", False),
        multi_scale=getattr(args, "multi_scale", False),
    )
    print(f"model complexity: {bf.complexity}")

    if args.cmd == "hmc":
        import contextlib

        # --warm-start-sigma exists only to rescale a --warm-start mass; a
        # silently-ignored flag re-pays the cold crawl it exists to avoid
        if args.warm_start_sigma is not None:
            if not args.warm_start:
                raise SystemExit(
                    "--warm-start-sigma requires --warm-start (it rescales "
                    "the warm-started mass; alone it does nothing)"
                )
            if args.warm_start_sigma <= 0:
                raise SystemExit("--warm-start-sigma must be > 0")

        _stack = contextlib.ExitStack()
        if args.trace:
            from naz_tpu.utils import trace as _trace

            _stack.enter_context(_trace(args.trace))
        if args.kernel == "chees":
            import copy

            from naz_tpu.bayes import fit_chees
            from naz_tpu.mcmc.chees import ChEESConfig

            fast_potential = None
            if getattr(args, "compute_dtype", None) == "bfloat16":
                # mixed precision: the bf16 flow drives leapfrog gradients;
                # accept energies come from an exact f32 twin, so the
                # posterior is exactly the f32 one
                fast_potential = bf.potential_centered
                a32 = copy.copy(args)
                a32.compute_dtype = None
                flow32 = _build_flow(a32, theta, lam)
                bf = BayesianFlow(
                    make_flow_loglik(flow32, theta, lam),
                    mle_params,
                    scale_max=args.sigma,
                    prior=getattr(args, "prior", "uniform"),
                    fixed_scale=not getattr(args, "free_scale", False),
                    multi_scale=getattr(args, "multi_scale", False),
                )
            post = fit_chees(
                bf,
                ChEESConfig(
                    num_warmup=args.num_warmup,
                    num_samples=args.num_samples,
                    num_chains=args.num_chains,
                    seed=args.seed,
                    chain_exec=args.chain_exec,
                    steps_per_program=args.steps_per_program,
                    max_leapfrogs=args.max_leapfrogs,
                    warmup_max_leapfrogs=args.warmup_max_leapfrogs,
                    min_leapfrogs=args.min_leapfrogs,
                    leapfrogs_per_program=args.leapfrogs_per_program,
                    thin_draws=args.thin_draws,
                    verbose=True,
                ),
                fast_potential=fast_potential,
                checkpoint_dir=args.chckpt,
                nbatch=args.nbatch,
                lean=True,
                curvature_init_mass=args.curvature_init_mass,
                out_thin=args.out_thin,
                warm_start=args.warm_start,
                warm_start_scale=(
                    (args.warm_start_sigma / args.sigma) ** 2
                    if args.warm_start_sigma is not None else 1.0
                ),
            )
        else:
            if args.warm_start:
                raise SystemExit("--warm-start requires --kernel chees")
            from naz_tpu.bayes import fit_nuts
            from naz_tpu.mcmc.run import MCMCRunConfig

            post = fit_nuts(
                bf,
                MCMCRunConfig(
                    num_warmup=args.num_warmup,
                    num_samples=args.num_samples,
                    num_chains=args.num_chains,
                    seed=args.seed,
                    chain_exec=args.chain_exec,
                    kernel=args.kernel,
                    steps_per_program=args.steps_per_program,
                    max_depth=args.max_depth,
                    verbose=True,
                ),
                checkpoint_dir=args.chckpt,
                nbatch=args.nbatch,
                lean=True,
                curvature_init_mass=args.curvature_init_mass,
                out_thin=args.out_thin,
            )
        _stack.close()  # flush the profiler trace before writing outputs
        np.savez(
            args.out,
            params_flat=np.asarray(post["params_flat"]),
            log_likelihood=np.asarray(post["log_likelihood"]),
            thin=np.asarray(post.get("thin", 1)),
        )
        print(json.dumps({k: v.tolist() if hasattr(v, "tolist") else v
                          for k, v in post["diagnostics"].items()}))
        return 0

    if args.cmd == "evidence":
        from naz_tpu.bayes import SteppingStoneConfig, stepping_stone_evidence

        ev = stepping_stone_evidence(
            bf,
            SteppingStoneConfig(
                n_temps=args.n_temps,
                num_warmup=args.num_warmup,
                num_samples=args.num_samples,
                num_chains=args.num_chains,
                chain_exec=args.chain_exec,
                steps_per_program=args.steps_per_program,
                max_depth=args.max_depth,
                seed=args.seed,
                verbose=True,
            ),
        )
        out = {
            "log_evidence": ev.log_evidence,
            "log_evidence_se": ev.log_evidence_se,
            "log_evidence_ti": ev.log_evidence_ti,
            "betas": ev.betas.tolist(),
            "mean_log_l": ev.mean_log_l.tolist(),
            "per_step_ess": ev.per_step_ess.tolist(),
        }
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f)
        print(json.dumps(out))
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
            bf, svi, jax.random.PRNGKey(args.seed),
            num_samples=args.evidence_samples, batch_size=args.evidence_batch,
        )
        draws = sample_svi_posterior(
            bf, svi, jax.random.PRNGKey(args.seed + 1), args.posterior_draws,
            lean=True,
        )
        # per-draw log-likelihoods (batched: each is a full-training-set
        # pass): BIC and the NUTS-vs-SVI comparison consume these, same
        # contract as the hmc posterior npz
        pf = draws["params_flat"]
        lls = []
        bs = max(1, args.evidence_batch or 8)
        ll_fn = jax.jit(jax.vmap(bf.log_likelihood_flat))
        for i in range(0, pf.shape[0], bs):
            lls.append(np.asarray(ll_fn(pf[i : i + bs])))
        ll = np.concatenate(lls)
        extra = {"log_likelihood": ll}
        if not bf.fixed_scale:
            extra.update(
                scale=np.asarray(draws["scale"]),
                scale_mu=np.asarray(svi.guide_params["scale_mu"]),
                scale_sigma=np.asarray(svi.guide_params["scale_sigma"]),
            )
        np.savez(
            args.out,
            params_flat=np.asarray(draws["params_flat"]),
            mu=np.asarray(svi.guide_params["mu"]),
            sigma=np.asarray(svi.guide_params["sigma"]),
            losses=svi.losses,
            **extra,
        )
        print(
            json.dumps(
                {
                    "final_neg_elbo": float(svi.losses[-1]),
                    "log_evidence": ev.log_evidence,
                    "log_evidence_se": ev.log_evidence_se,
                    "is_ess": ev.ess,
                    "evidence_samples": ev.num_samples,
                    "max_log_likelihood": float(np.max(ll)),
                }
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

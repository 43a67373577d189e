"""Decompose the production coverage deficit: MLE bias vs posterior width.

VERDICT r4 #2 asks, if coverage stays far below nominal as sigma0 grows,
to "state, with the data, which mechanism dominates (weight-posterior
width vs MLE bias)". This tool computes that statement from the committed
sweep artifacts, per sigma0:

  t_b   truth bin density (equal-quantile bins of the held-out test set,
        the same binning the calibrate engine uses),
  m_b   MLE-flow bin density (the ensemble center),
  mu_b  PPD-ensemble mean bin density, s_b its sd across posterior draws.

Per nonzero bin the coverage condition is roughly |t_b - mu_b| <~ z*s_b.
Over nonzero bins we report:
  - median/IQR of |t_b - mu_b| / s_b  ("how many posterior sds the truth
    sits from the ensemble" — >> 1 means no interval type can cover),
  - median |mu_b - m_b| / |t_b - m_b| ("does the ensemble move off the
    MLE toward the truth, or just widen around it"),
  - the width multiplier needed for nominal-0.95 coverage if the bias
    stayed fixed (p95 of |bias|/s divided by 1.96).

If |bias|/s >> 1 and mu_b ~ m_b, the deficit is MLE bias at bin scale:
widening the weight posterior (larger sigma0) cannot close it — the
aleatoric/bootstrap ensemble path (train/ensemble.py, the reference's
train_mle_aleatoric.py:20-78) is the right lever. If |bias|/s ~ 1,
under-coverage is a width problem and larger sigma0 closes it.

Reuses the CLI's own flow/data setup (naz_tpu.__main__._posterior_setup)
so the flow construction matches the sweep runs exactly. CPU-friendly at
modest draw/sample counts (bin densities at nq=25 are stable at 1e4-1e5
samples); pass --cpu to keep off a busy chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--mle-params", required=True)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, nargs="+", default=[150, 150, 150])
    ap.add_argument("--posteriors", nargs="+", required=True,
                    help="sigma0=path pairs, e.g. 0.01=__run_sweep__/post_0.01.npz")
    ap.add_argument("--nq", type=int, default=25)
    ap.add_argument("--n-samples", type=int, default=100_000)
    ap.add_argument("--max-draws", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--out", default=None, help="write a JSON report here")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from naz_tpu.__main__ import _build_flow, _even_thin, _posterior_setup
    from naz_tpu.io.checkpoint import load_pytree
    from naz_tpu.stats.calibrate import _bin_densities, posterior_predictive
    from naz_tpu.stats.statutils import equal_quantile_edges

    # reuse the CLI's exact setup (same flow spec defaults as the sweep)
    ns = argparse.Namespace(
        data=args.data, layers=args.layers, hidden=args.hidden,
        flow_type="maf", count_bins=8, dropout=0.0, bounds_low=None,
        bounds_high=None, seed=args.seed, compute_dtype=None,
        use_pallas=False, scan_unroll=1,
    )
    theta_true, context, flow, template, unravel = _posterior_setup(ns)
    mle_params = load_pytree(args.mle_params, template)
    d = theta_true.shape[-1]

    nbins = max(1, int(round(args.nq ** (1.0 / d))))
    edges = [jnp.asarray(e) for e in equal_quantile_edges(theta_true, nbins)]
    t_b = np.asarray(_bin_densities(jnp.asarray(theta_true), edges))
    nonzero = t_b > 0
    # per-bin volumes (histogramdd density normalization): needed to
    # subtract the finite-sample Monte-Carlo variance of each draw's bin
    # density from the observed across-draw spread — otherwise the "width"
    # at CPU-affordable sample counts is sampling noise, not posterior
    # spread. var_mc(den) = p(1-p)/(n * vol^2), p = den * vol.
    widths = [np.diff(np.asarray(e)) for e in edges]
    vol = widths[0]
    for w in widths[1:]:
        vol = np.multiply.outer(vol, w)

    key = jax.random.PRNGKey(args.seed)
    ctx = None if context is None else jnp.asarray(context)

    key, k_mle = jax.random.split(key)
    m_b = np.asarray(
        _bin_densities(
            jnp.asarray(flow.sample(mle_params, k_mle, args.n_samples, context=ctx)),
            edges,
        )
    )

    report = {"nq": args.nq, "n_samples": args.n_samples,
              "max_draws": args.max_draws, "n_nonzero_bins": int(nonzero.sum()),
              "per_sigma": {}}
    for spec in args.posteriors:
        sig, path = spec.split("=", 1)
        pf = _even_thin(np.load(path)["params_flat"], args.max_draws)
        draws = jax.vmap(unravel)(jnp.asarray(pf))
        key, k_ppd = jax.random.split(key)
        ppd = posterior_predictive(
            flow, draws, k_ppd, args.n_samples, context=ctx, draw_batch=2,
        )
        hb = np.stack([
            np.asarray(_bin_densities(jnp.asarray(ppd[i]), edges))
            for i in range(ppd.shape[0])
        ])
        mu_b, s_b = hb.mean(0), hb.std(0, ddof=1)
        # per-draw histogram MC variance (see vol above): a bin whose
        # across-draw spread is mostly sampling noise cannot resolve the
        # posterior width — censor it rather than subtract noisily
        p_b = np.clip(mu_b * vol, 0.0, 1.0)
        mc_var = p_b * (1.0 - p_b) / (args.n_samples * vol**2)
        s_corr = np.sqrt(np.maximum(s_b**2 - mc_var, 0.0))
        resolvable = nonzero & (mc_var < 0.5 * np.maximum(s_b**2, 1e-60))
        mc_floor = float(
            np.median((np.sqrt(mc_var) / np.maximum(s_b, 1e-30))[nonzero])
        )
        if resolvable.sum() < 0.5 * nonzero.sum():
            print(
                f"sigma0={sig}: WARNING {nonzero.sum() - resolvable.sum()}/"
                f"{nonzero.sum()} bins are MC-noise-limited — raise "
                "--n-samples for a trustworthy decomposition", flush=True,
            )

        bias = np.abs(mu_b - t_b)[resolvable]
        width = np.maximum(s_corr[resolvable], 1e-30)
        ratio = bias / width
        mle_bias = np.abs(m_b - t_b)[resolvable]
        shift = np.abs(mu_b - m_b)[resolvable]
        per = {
            "n_resolvable_bins": int(resolvable.sum()),
            "bias_over_width_median": float(np.median(ratio)),
            "bias_over_width_iqr": [float(np.percentile(ratio, 25)),
                                    float(np.percentile(ratio, 75))],
            "frac_bins_bias_gt_2sd": float(np.mean(ratio > 1.96)),
            "ens_shift_over_mle_bias_median": float(
                np.median(shift / np.maximum(mle_bias, 1e-30))
            ),
            "width_multiplier_for_nominal95": float(
                np.percentile(ratio, 95) / 1.96
            ),
            "mc_noise_fraction_of_width": mc_floor,
            "n_draws": int(len(pf)),
        }
        report["per_sigma"][sig] = per
        print(f"sigma0={sig}: |bias|/sd median {per['bias_over_width_median']:.1f} "
              f"IQR {per['bias_over_width_iqr'][0]:.1f}-{per['bias_over_width_iqr'][1]:.1f}; "
              f"{100*per['frac_bins_bias_gt_2sd']:.0f}% of bins beyond 2sd; "
              f"ensemble shift/MLE-bias {per['ens_shift_over_mle_bias_median']:.2f}; "
              f"width x{per['width_multiplier_for_nominal95']:.0f} needed at p95; "
              f"MC noise {100*mc_floor:.0f}% of raw width",
              flush=True)

    verdictline = (
        "MLE bias dominates (widening sigma0 cannot close the gap; use the "
        "aleatoric/bootstrap ensemble)"
        if min(p["bias_over_width_median"] for p in report["per_sigma"].values()) > 3
        else "posterior width is a first-order contributor (larger sigma0 helps)"
    )
    report["conclusion"] = verdictline
    print("conclusion:", verdictline)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

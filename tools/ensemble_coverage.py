"""Does MLE-refit spread cover the bin bias? (aleatoric-ensemble analysis)

Follow-up to tools/coverage_mechanism.py: that tool showed the weight
POSTERIOR widens around one MLE and cannot cover the truth. The remaining
question is whether the bias is *fit-random* (varies across independent
MLE refits — then the reference's aleatoric ensemble,
train_mle_aleatoric.py:20-78, covers it) or *systematic* (shared by every
refit — then nothing that disperses around MLEs can calibrate this
model/data). This compares, per equal-quantile bin:

  t_b      truth density,
  m_i,b    each ensemble member's density,
  mean/sd  across members,

and reports |mean_i(m_i,b) − t_b| / sd_i(m_i,b) (shared bias in units of
member spread, MC-corrected/censored as in coverage_mechanism) plus a
Gaussian-approximation coverage of the truth by member mean ± z·sd (the
right small-ensemble interval — empirical quantiles are meaningless at
4-8 members).
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
    ap.add_argument("--ensemble", required=True, help="stacked params npz "
                    "(train-ensemble --out)")
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, nargs="+", default=[150, 150, 150])
    ap.add_argument("--nq", type=int, default=25)
    ap.add_argument("--n-samples", type=int, default=500_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from naz_tpu.__main__ import _posterior_setup
    from naz_tpu.stats.calibrate import _bin_densities
    from naz_tpu.stats.statutils import equal_quantile_edges

    ns = argparse.Namespace(
        data=args.data, layers=args.layers, hidden=args.hidden,
        flow_type="maf", count_bins=8, dropout=0.0, bounds_low=None,
        bounds_high=None, seed=args.seed, compute_dtype=None,
        use_pallas=False, scan_unroll=1,
    )
    theta_true, context, flow, template, _ = _posterior_setup(ns)
    # stacked members: save_pytree leaves (leaf_i order) with a leading
    # member axis relative to the single-flow template
    tdef = jax.tree.structure(template)
    with np.load(args.ensemble) as z:
        leaves = [z[f"leaf_{i}"] for i in range(tdef.num_leaves)]
    stacked = jax.tree.unflatten(tdef, leaves)
    M = jax.tree.leaves(stacked)[0].shape[0]

    d = theta_true.shape[-1]
    nbins = max(1, int(round(args.nq ** (1.0 / d))))
    edges = [jnp.asarray(e) for e in equal_quantile_edges(theta_true, nbins)]
    t_b = np.asarray(_bin_densities(jnp.asarray(theta_true), edges))
    nonzero = t_b > 0
    widths = [np.diff(np.asarray(e)) for e in edges]
    vol = widths[0]
    for w in widths[1:]:
        vol = np.multiply.outer(vol, w)

    key = jax.random.PRNGKey(args.seed)
    ctx = None if context is None else jnp.asarray(context)
    dens = []
    for i in range(M):
        member = jax.tree.map(lambda a: jnp.asarray(a[i]), stacked)
        key, k = jax.random.split(key)
        s = flow.sample(member, k, args.n_samples, context=ctx)
        dens.append(np.asarray(_bin_densities(jnp.asarray(s), edges)))
        print(f"member {i + 1}/{M} sampled", flush=True)
    dens = np.stack(dens)
    mu_b, s_b = dens.mean(0), dens.std(0, ddof=1)

    p_b = np.clip(mu_b * vol, 0.0, 1.0)
    mc_var = p_b * (1.0 - p_b) / (args.n_samples * vol**2)
    s_corr = np.sqrt(np.maximum(s_b**2 - mc_var, 0.0))
    resolvable = nonzero & (mc_var < 0.5 * np.maximum(s_b**2, 1e-60))

    bias = np.abs(mu_b - t_b)[resolvable]
    width = np.maximum(s_corr[resolvable], 1e-30)
    ratio = bias / width
    # Gaussian-approx coverage of truth by mean +- z*sd over nonzero bins
    # (sd incl. MC part — the honest achievable interval at this budget)
    z95 = 1.96
    covered = float(
        np.mean(
            (np.abs(mu_b - t_b) <= z95 * np.maximum(s_b, 1e-30))[nonzero]
        )
    )

    report = {
        "n_members": int(M), "nq": args.nq, "n_samples": args.n_samples,
        "n_nonzero_bins": int(nonzero.sum()),
        "n_resolvable_bins": int(resolvable.sum()),
        "shared_bias_over_member_spread_median": float(np.median(ratio)),
        "shared_bias_over_member_spread_iqr": [
            float(np.percentile(ratio, 25)), float(np.percentile(ratio, 75))],
        "frac_bins_bias_gt_2sd": float(np.mean(ratio > z95)),
        "gaussian95_coverage_of_truth": covered,
    }
    print(json.dumps(report, indent=1))
    verdictline = (
        "bias is SYSTEMATIC across refits (ensemble spread cannot cover it)"
        if np.median(ratio) > 2
        else "bias is largely fit-random (ensemble spread covers it)"
    )
    report["conclusion"] = verdictline
    print("conclusion:", verdictline)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

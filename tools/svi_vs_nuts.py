"""NUTS-vs-SVI production comparison table (VERDICT r3 #4).

Reference pipeline being reproduced: ``svi_maf_exact.py:125-132`` (SVI at
the 2-D production config), ``train_flows.py:358-380`` (IS evidence with
the guide proposal), ``compute_bic_simpler.py:95-131`` (BIC) — one table
comparing the converged ChEES/NUTS weight posterior against the
variational one: diagnostic-coordinate moments, weight-space spread,
log-likelihood summaries, BIC, and the evidence numbers.

Usage:
  python tools/svi_vs_nuts.py __run_2d__/post_2d.npz __run_svi__/svi_2d.npz \
      --svi-json __run_svi__/svi_2d.json --n-data 190000
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _flat(pf):
    pf = np.asarray(pf)
    return pf.reshape(-1, pf.shape[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("nuts_npz")
    ap.add_argument("svi_npz")
    ap.add_argument("--svi-json", default=None,
                    help="stdout JSON of the svi CLI (evidence numbers)")
    ap.add_argument("--evidence-json", default=None,
                    help="JSON from the evidence CLI (stepping-stone/TI "
                    "log Z — fills the table's evidence hole where "
                    "guide-IS collapses)")
    ap.add_argument("--n-data", type=int, required=True)
    ap.add_argument("--n-coords", type=int, default=4096,
                    help="random weight coordinates for the spread ratio")
    ap.add_argument("--out", default=None, help="write the table here too")
    args = ap.parse_args(argv)

    nuts = np.load(args.nuts_npz)
    svi = np.load(args.svi_npz)
    pf_n = _flat(nuts["params_flat"])
    pf_s = _flat(svi["params_flat"])
    P = pf_n.shape[-1]
    assert pf_s.shape[-1] == P

    rng = np.random.default_rng(0)
    idx = rng.choice(P, size=min(args.n_coords, P), replace=False)
    sd_n = pf_n[:, idx].std(0)
    sd_s = pf_s[:, idx].std(0)
    ratio = sd_s / np.maximum(sd_n, 1e-12)

    ll_n = np.asarray(nuts["log_likelihood"]).reshape(-1)
    ll_s = np.asarray(svi["log_likelihood"]).reshape(-1)
    from naz_tpu.stats.model_comparison import compute_bic

    bic_n = float(compute_bic(ll_n, args.n_data, P))
    bic_s = float(compute_bic(ll_s, args.n_data, P))

    lines = []
    a = lines.append
    a("| quantity | NUTS/ChEES | SVI (mean-field guide) |")
    a("|---|---|---|")
    a(f"| posterior draws compared | {pf_n.shape[0]} | {pf_s.shape[0]} |")
    for k in range(min(4, P)):
        # scientific notation: posterior weight sds are ~1e-5 at sigma0=0.01
        # (multiplicative prior), far below any fixed-decimal format
        a(
            f"| weight coord {k}: mean ± sd | "
            f"{pf_n[:, k].mean():+.3e} ± {pf_n[:, k].std():.2e} | "
            f"{pf_s[:, k].mean():+.3e} ± {pf_s[:, k].std():.2e} |"
        )
    a(
        f"| weight-space spread sd(SVI)/sd(NUTS), median [IQR] over "
        f"{len(idx)} coords | 1 (def) | "
        f"{np.median(ratio):.3f} [{np.percentile(ratio, 25):.3f}, "
        f"{np.percentile(ratio, 75):.3f}] |"
    )
    a(
        f"| log-likelihood max / mean | {ll_n.max():.1f} / {ll_n.mean():.1f} "
        f"| {ll_s.max():.1f} / {ll_s.mean():.1f} |"
    )
    a(f"| BIC (P log N - 2 max log L) | {bic_n:.1f} | {bic_s:.1f} |")
    if args.svi_json:
        with open(args.svi_json) as f:
            ev = json.load(f)
        a(
            f"| IS evidence (guide proposal) | — | log Z = "
            f"{ev['log_evidence']:.1f} ± {ev['log_evidence_se']:.2f}, "
            f"IS ESS = {ev['is_ess']:.1f} / {ev.get('evidence_samples', '?')} |"
        )
        a(f"| final -ELBO | — | {ev['final_neg_elbo']:.1f} |")
    if args.evidence_json:
        with open(args.evidence_json) as f:
            pz = json.load(f)
        se = pz.get("log_evidence_se")
        se_s = f" ± {se:.2f}" if se is not None else ""
        agree = ""
        if se is not None:
            d = abs(pz["log_evidence"] - pz["log_evidence_ti"])
            agree = (
                f" (TI−SS = {pz['log_evidence_ti']-pz['log_evidence']:+.2f}, "
                f"{'within' if d <= 2 * se else 'OUTSIDE'} 2·SE)"
            )
        a(
            f"| log Z, stepping-stone ({len(pz['betas'])}-rung ladder) | "
            f"{pz['log_evidence']:.1f}{se_s} | — |"
        )
        a(
            f"| log Z, thermodynamic integration | "
            f"{pz['log_evidence_ti']:.1f}{agree} | — |"
        )

    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

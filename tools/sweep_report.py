"""Assemble the sigma0-sweep coverage calibration study (VERDICT r3 #2).

Reads the per-sigma coverage curves written by `naz_tpu calibrate`
(``calib_<sigma>_nq<NQ>.txt``: columns credibility / empirical coverage)
out of a sweep directory, prints the calibration table, and writes the
overlay figure the reference's study produces
(``examples/papers/2506.05657/plot_callibration.py:22-36``: one
empirical-vs-nominal curve per sigma0, diagonal = calibrated).

Usage: python tools/sweep_report.py __run_sweep__ [--out PREFIX]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np


def load_sweep(d):
    """{nq: {sigma: (cs, cov)}} from calib_<sigma>_nq<NQ>.txt files."""
    out = {}
    for f in sorted(glob.glob(os.path.join(d, "calib_*_nq*.txt"))):
        m = re.match(r"calib_([0-9.]+)_nq(\d+)\.txt", os.path.basename(f))
        if not m:
            continue
        sigma, nq = float(m.group(1)), int(m.group(2))
        arr = np.loadtxt(f)
        out.setdefault(nq, {})[sigma] = (arr[:, 0], arr[:, 1])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_dir")
    ap.add_argument("--out", default=None, help="figure/table prefix")
    args = ap.parse_args(argv)
    prefix = args.out or os.path.join(args.sweep_dir, "sweep")

    sweep = load_sweep(args.sweep_dir)
    if not sweep:
        print(f"no calib_*_nq*.txt files in {args.sweep_dir}", file=sys.stderr)
        return 1

    summary = {}
    for nq, curves in sorted(sweep.items()):
        print(f"\n== coverage vs nominal credibility (nq={nq}) ==")
        sigmas = sorted(curves)
        header = "nominal  " + "  ".join(f"s0={s:g}" for s in sigmas)
        print(header)
        cs = curves[sigmas[0]][0]
        for i, c in enumerate(cs):
            row = f"{c:7.3f}  " + "  ".join(
                f"{curves[s][1][i]:7.3f}" for s in sigmas
            )
            print(row)
        # calibration score: mean |empirical - nominal| over the curve —
        # the sigma0 minimizing it is the calibrated choice
        scores = {
            s: float(np.mean(np.abs(curves[s][1] - curves[s][0])))
            for s in sigmas
        }
        best = min(scores, key=scores.get)
        print("mean |empirical-nominal|: " + "  ".join(
            f"s0={s:g}: {scores[s]:.3f}" for s in sigmas
        ))
        print(f"calibrated sigma0 at nq={nq}: {best:g}")
        summary[nq] = {"scores": scores, "best": best}

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nqs = sorted(sweep)
        fig, axes = plt.subplots(
            1, len(nqs), figsize=(5 * len(nqs), 4.2), squeeze=False
        )
        for ax, nq in zip(axes[0], nqs):
            for s in sorted(sweep[nq]):
                cs, cov = sweep[nq][s]
                ax.plot(cs, cov, marker="o", ms=3, label=f"$\\sigma_0$={s:g}")
            ax.plot([0, 1], [0, 1], "k--", lw=1, label="calibrated")
            ax.set_xlabel("nominal credibility")
            ax.set_ylabel("empirical coverage")
            ax.set_title(f"nq={nq}")
            ax.set_xlim(0, 1)
            ax.set_ylim(0, 1)
            ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(f"{prefix}_coverage.png", dpi=130)
        print(f"\nfigure: {prefix}_coverage.png")
    except ImportError as e:
        print(f"figure skipped: {e}", file=sys.stderr)

    with open(f"{prefix}_summary.json", "w") as f:
        json.dump(
            {str(k): {"best": v["best"],
                      "scores": {str(s): sc for s, sc in v["scores"].items()}}
             for k, v in summary.items()},
            f, indent=1,
        )
    print(f"summary: {prefix}_summary.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

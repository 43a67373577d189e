"""Sampler-health table for the sigma0 sweep (RESULTS.md §1).

Parses the final diagnostics JSON line of each ``hmc_<sigma>.log`` in a
sweep dir into a markdown table: split-R-hat max, ESS min/median,
acceptance, adapted eps/T, divergences.

Usage: python tools/sweep_health.py __run_sweep__
"""

import glob
import json
import os
import re
import sys


def main(d):
    rows = []
    # continuation logs (hmc_0.1_ext.log, ...) belong to the same sigma;
    # the row must come from the LATEST diagnostics across all of a
    # sigma's logs (by mtime), not silently from the base log
    by_sigma = {}
    for f in sorted(glob.glob(os.path.join(d, "hmc_*.log"))):
        m = re.match(r"hmc_([0-9.]+?)(_\w+)?\.log", os.path.basename(f))
        if not m:
            continue
        by_sigma.setdefault(float(m.group(1)), []).append(f)
    for sigma, files in by_sigma.items():
        diag = None
        for f in sorted(files, key=os.path.getmtime):
            with open(f) as fh:
                for line in fh:
                    line = line.strip()
                    if line.startswith("{") and "split_rhat" in line:
                        try:
                            diag = json.loads(line)
                        except json.JSONDecodeError:
                            pass
        if diag is None:
            print(f"(no diagnostics line in {files})", file=sys.stderr)
            continue
        rh = diag.get("split_rhat") or []
        ess = diag.get("ess") or []
        rh_max = max(rh) if rh else float("nan")
        ess_min = min(ess) if ess else float("nan")
        import statistics

        ess_med = statistics.median(ess) if ess else float("nan")
        rows.append(
            (sigma, rh_max, ess_min, ess_med,
             diag.get("mean_accept_prob", float("nan")),
             diag.get("step_size", float("nan")),
             diag.get("traj_len", float("nan")),
             diag.get("divergence_fraction", 0.0))
        )
    print("| σ₀ | split-R̂ max | ESS min | ESS med | accept | ε | T | div |")
    print("|---|---|---|---|---|---|---|---|")
    for s, rh, emin, emed, acc, eps, T, dv in sorted(rows):
        print(
            f"| {s:g} | {rh:.4f} | {emin:.0f} | {emed:.0f} | {acc:.3f} "
            f"| {eps:.4f} | {T:.3f} | {dv:g} |"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "__run_sweep__")

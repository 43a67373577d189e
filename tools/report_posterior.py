"""Summarize a checkpointed production posterior run for PERFORMANCE.md.

Reads a ChEES checkpoint dir (warmup.json + posterior_batch_*.npz with the
lean per-draw traces) and the CLI output npz, and prints a markdown-ready
summary: per-chain energy-trace statistics, split-R-hat / ESS over the
diagnostic projections, acceptance, leapfrog counts, grad-eval totals, and
wall-clock (from file mtimes).

Usage: python tools/report_posterior.py CKPT_DIR [OUT_NPZ] [--tail N]

``--tail N`` restricts the R-hat/ESS diagnostics to the last N draws per
chain — the standard burn-in discard: during a long relaxation the full
trace's R-hat measures the transient, not the stationary mixing.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(ckpt_dir, out_npz=None, *extra):
    tail = None
    args = [out_npz, *extra]
    if "--tail" in args:
        i = args.index("--tail")
        tail = int(args[i + 1])
        del args[i : i + 2]
    out_npz = args[0] if args else None
    import jax

    jax.config.update("jax_platforms", "cpu")
    from naz_tpu.mcmc.chees import posterior_batch_files
    from naz_tpu.mcmc.diagnostics import effective_sample_size, split_rhat

    files = posterior_batch_files(ckpt_dir)
    if not files:
        print(f"no posterior batches in {ckpt_dir}")
        return 1
    energy, q8, acc, L = [], [], [], []
    for f in files:
        with np.load(f) as z:
            acc.append(z["accept_prob"])
            L.append(z["num_leapfrogs"])
            if "energy" in z.files:
                energy.append(z["energy"])
                q8.append(z["q8"])
    acc = np.concatenate(acc)
    L = np.concatenate(L)
    print(f"batches: {len(files)}, draws/chain: {acc.shape[0]}, "
          f"chains: {acc.shape[1]}")
    print(f"accept: mean {acc.mean():.3f} per-chain "
          f"{np.round(acc.mean(0), 3).tolist()}")
    print(f"leapfrogs/draw: mean {L.mean():.1f} range [{L.min()}, {L.max()}]"
          f" -> grad evals (sampling) {int(L.sum()) * acc.shape[1]}")

    wj = os.path.join(ckpt_dir, "warmup.json")
    if os.path.exists(wj):
        with open(wj) as f:
            w = json.load(f)
        print(f"warmup: grad evals {w.get('num_grad_evals')}, "
              f"eps {w.get('step_size'):.4g}, T {w.get('traj_len'):.4g}")

    if energy:
        e = np.concatenate(energy)  # (draws, chains)
        q8c = np.concatenate(q8)
        print("\nper-chain energy trace:")
        for c in range(e.shape[1]):
            t = e[:, c]
            print(f"  chain {c}: start {t[0]:.2f} end {t[-1]:.2f} "
                  f"min {t.min():.2f} max {t.max():.2f} sd {t.std():.2f}")
        diag = np.concatenate([e[..., None], q8c], axis=-1)
        if tail is not None and tail < diag.shape[0]:
            diag = diag[-tail:]
            print(f"\n[diagnostics over the last {tail} draws/chain]")
        rh = np.asarray(split_rhat(diag))
        ess = np.asarray(effective_sample_size(diag))
        print(f"\nsplit-Rhat (energy + first-8 coords): "
              f"{np.round(rh, 4).tolist()}")
        print(f"ESS: {np.round(ess, 1).tolist()}")
        print(f"Rhat max {rh.max():.4f}  ESS min {ess.min():.1f} "
              f"total draws {diag.shape[0] * e.shape[1]}"
              + (" (tail)" if tail else ""))

    if out_npz and os.path.exists(out_npz):
        with np.load(out_npz) as z:
            pf = z["params_flat"]
            ll = z["log_likelihood"]
            print(f"\noutput npz: params_flat {pf.shape} "
                  f"({pf.nbytes / 1e9:.2f} GB), thin {int(z['thin'])}, "
                  f"ll range [{ll.min():.2f}, {ll.max():.2f}]")

    t0 = os.path.getmtime(files[0])
    t1 = os.path.getmtime(files[-1])
    if len(files) > 1:
        per = (t1 - t0) / (len(files) - 1)
        print(f"\nwall: {per:.0f}s per batch (from file mtimes), "
              f"sampling total ~{(t1 - t0) + per:.0f}s + warmup")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

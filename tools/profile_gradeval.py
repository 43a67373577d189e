"""Per-op roofline account of the production grad eval (VERDICT r3 #4).

Captures a jax.profiler device trace of the north-star workload — one
value_and_grad of the Bayesian-flow potential at the 2506.05657 production
shape (16x[150]^3 conditional MAF, N=190k, bf16 compute) — and itemizes
device time by HLO op/category from the xplane, closing the round-2 gap
where the missing fraction of the 4x-forward bound was asserted rather
than measured.

Usage (chip must be idle):
    python tools/profile_gradeval.py [--iters 24] [--out PERF_PROFILE.json]

Prints a per-op table (top ops by device time), a category rollup, and the
same for a forward-only pass, so fwd vs backward-specific cost is
attributable line by line.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _capture(run, q0, trace_dir):
    run(q0).block_until_ready()  # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    run(q0).block_until_ready()
    jax.profiler.stop_trace()


def _device_events(trace_dir):
    """Yield (name, duration_ns, stats_dict) for device-plane events."""
    from jax.profiler import ProfileData

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not files:
        raise FileNotFoundError(f"no xplane under {trace_dir}")
    pd = ProfileData.from_serialized_xspace(open(sorted(files)[-1], "rb").read())
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                stats = {}
                for k, v in ev.stats:
                    stats[k] = v
                yield ev.name, ev.duration_ns, stats


def summarize(trace_dir, top=25):
    by_name, by_cat = {}, {}
    total = 0
    for name, dur, stats in _device_events(trace_dir):
        cat = stats.get("hlo_category", stats.get("category", "?"))
        by_name[name] = by_name.get(name, 0) + dur
        by_cat[str(cat)] = by_cat.get(str(cat), 0) + dur
        total += dur
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    return total, rows, sorted(by_cat.items(), key=lambda kv: -kv[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--out", default=None)
    ap.add_argument("--trace-dir", default="/tmp/naz_profile")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    report = {}
    for mode, fwd_only in (("grad", False), ("fwd", True)):
        run, q0 = bench.make_runner(args.iters, fwd_only=fwd_only)
        tdir = os.path.join(args.trace_dir, mode)
        t0 = time.time()
        _capture(lambda q: run(q, 1e-12), q0, tdir)
        wall = time.time() - t0
        total, rows, cats = summarize(tdir)
        print(f"\n=== {mode}: {args.iters} iters, trace wall {wall:.1f}s, "
              f"device total {total / 1e6:.1f} ms "
              f"({total / 1e6 / args.iters:.2f} ms/iter) ===")
        for name, dur in rows:
            print(f"  {dur / 1e6:9.2f} ms  {100 * dur / total:5.1f}%  {name[:90]}")
        print("  -- categories --")
        for cat, dur in cats:
            print(f"  {dur / 1e6:9.2f} ms  {100 * dur / total:5.1f}%  {cat}")
        report[mode] = {
            "device_total_ms": total / 1e6,
            "ms_per_iter": total / 1e6 / args.iters,
            "top_ops_ms": {n: d / 1e6 for n, d in rows},
            "categories_ms": {c: d / 1e6 for c, d in cats},
        }

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

"""Produce bench_assets/ess_warmup_state.npz — the committed warmup
checkpoint the budget-aware ESS bench resumes from (bench.py bench_ess).

Runs exactly bench_ess's warmup (same seeded data/flow/config) and exits
after the asset is saved, skipping the sampling phase. ~16 min on the
chip (the measured ~950 s warmup + compile).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    asset = "bench_assets/ess_warmup_state.npz"
    if os.path.exists(asset):
        print(f"{asset} already exists; delete it to regenerate")
        return
    bench.wait_for_chip()
    try:
        # bench_ess saves the asset immediately after warmup, before
        # sampling; a tiny sampling budget ends the call quickly and the
        # not-converged refusal it raises is expected and harmless here.
        bench.bench_ess(num_samples=8, budget_s=1.0)
    except RuntimeError as e:
        print(f"(expected refusal after asset save: {e})")
    assert os.path.exists(asset), "warmup asset was not written"
    print(f"asset written: {asset}")


if __name__ == "__main__":
    main()

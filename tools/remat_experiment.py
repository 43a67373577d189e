"""Measure the remat tax on the headline grad eval (VERDICT r3 #4 follow-on).

The production grad eval rematerializes each flow layer's activations in
the backward pass (jax.checkpoint in flows/maf.py): ~4x forward matmul
FLOPs per grad. At the 2-D bench shape ONE chain's stored residuals are
only ~2.7 GB (bf16), well under HBM — storing them buys a 3x-forward
backward. This times the grad-eval slope with remat on vs off (and the
forward slope as the shared reference).

Run on an idle chip: python tools/remat_experiment.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def slope(fwd_only=False, remat=True):
    t_lo = bench.timed(bench.ITERS_LO, fwd_only, remat=remat)
    t_hi = bench.timed(bench.ITERS_HI, fwd_only, remat=remat)
    return (t_hi - t_lo) / (bench.ITERS_HI - bench.ITERS_LO)


def main():
    bench.wait_for_chip()
    per_fwd = slope(fwd_only=True)
    per_grad_remat = slope(remat=True)
    per_grad_norem = slope(remat=False)
    print(f"fwd:            {per_fwd * 1e3:8.2f} ms")
    print(f"grad (remat):   {per_grad_remat * 1e3:8.2f} ms "
          f"({per_grad_remat / per_fwd:.2f}x fwd, "
          f"{1 / per_grad_remat:.1f} ge/s)")
    print(f"grad (stored):  {per_grad_norem * 1e3:8.2f} ms "
          f"({per_grad_norem / per_fwd:.2f}x fwd, "
          f"{1 / per_grad_norem:.1f} ge/s)")


if __name__ == "__main__":
    main()

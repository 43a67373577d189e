"""Measure the 4-param production grad-eval cost across backends.

The r3 rerun's warmup ran ~8 min per 48-leapfrog iteration (4 chains,
map) — ~2.5 s per chain-grad against a ~0.2-0.3 s expectation. This
isolates the per-grad cost at the exact production shape (18x[512]^5,
P=19M) for bf16-Pallas vs bf16-XLA vs f32-XLA, in the sampler-like
scan-of-dependent-grads form, at full and thinned N.

Run on an idle chip: python tools/grad_probe_4param.py [--iters 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def runner(n_data, use_pallas, compute_dtype, n_iters):
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow

    key = jax.random.PRNGKey(0)
    lam = jax.random.uniform(key, (n_data, 2), minval=-1, maxval=1)
    th = jax.random.normal(jax.random.PRNGKey(1), (n_data, 4)) * 0.5
    flow = maf_flow(
        4, n_layers=18, hidden_dims=(512,) * 5, context_dim=2, seed=0,
        use_pallas=use_pallas, compute_dtype=compute_dtype,
    )
    params = flow.init_params(jax.random.PRNGKey(3))
    bf = BayesianFlow(make_flow_loglik(flow, th, lam), params, scale_max=0.01)
    pg = jax.value_and_grad(bf.potential_centered)
    q0 = bf.init_positions(jax.random.PRNGKey(4), 1, jitter=0.01)[0]

    @jax.jit
    def run(q, eps):
        def body(carry, _):
            q, acc = carry
            U, g = pg(q)
            return (q + eps * g, acc + U), None

        (qf, acc), _ = jax.lax.scan(body, (q, 0.0), None, length=n_iters)
        return acc

    return run, q0


def slope(n_data, use_pallas, compute_dtype, lo, hi):
    per = {}
    for n in (lo, hi):
        run, q0 = runner(n_data, use_pallas, compute_dtype, n)
        t0 = time.time()
        float(run(q0, 1e-12))
        print(f"  iters={n}: compile+run {time.time() - t0:.0f}s", flush=True)
        best = float("inf")
        for r in range(2):
            t0 = time.time()
            float(run(q0, 1e-12 * (1 + r)))
            best = min(best, time.time() - t0)
        per[n] = best
    return (per[hi] - per[lo]) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=6)
    ap.add_argument("--hi", type=int, default=18)
    ap.add_argument("--full-n", type=int, default=190_000)
    args = ap.parse_args()

    import bench

    bench.wait_for_chip()
    for n_data in (args.full_n, args.full_n // 4):
        for use_pallas, dtype, label in (
            (True, "bfloat16", "pallas-bf16"),
            (False, "bfloat16", "xla-bf16"),
            (False, None, "xla-f32"),
        ):
            print(f"[{label} N={n_data}]", flush=True)
            try:
                s = slope(n_data, use_pallas, dtype, args.lo, args.hi)
                print(f"  -> {s * 1e3:.0f} ms/grad ({1 / s:.2f} ge/s)",
                      flush=True)
            except Exception as e:
                print(f"  -> FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

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


def sampler_shaped(n_data, use_pallas, compute_dtype, n_chains=4, n_leap=24):
    """The warmup's exact execution shape: lax.map over chains of a
    fori_loop of leapfrogs — isolates composition overhead vs plain
    scan-of-grads."""
    from jax import lax

    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow
    from naz_tpu.mcmc.hmc import LeapfrogState, leapfrog

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
    q0 = bf.init_positions(jax.random.PRNGKey(4), n_chains, jitter=0.01)
    inv_mass = jnp.ones((q0.shape[-1],))

    @jax.jit
    def run(q, L):
        U, g = jax.vmap(pg)(q) if n_chains > 1 else pg(q)
        r = 1e-3 * jnp.ones_like(q)
        s0 = LeapfrogState(q, r, U, g)

        def body(_, s):
            return lax.map(
                lambda si: leapfrog(pg, si, 1e-9, inv_mass), s
            )

        s1 = lax.fori_loop(0, L, body, s0)
        return s1.U.sum()

    t0 = time.time()
    float(run(q0, n_leap))
    print(f"  sampler-shaped compile+run({n_leap} leaps x {n_chains} ch): "
          f"{time.time() - t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(run(q0, n_leap))
        best = min(best, time.time() - t0)
    per_chain_grad = best / (n_leap * n_chains)
    print(f"  -> {per_chain_grad * 1e3:.0f} ms/chain-grad in sampler shape",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=6)
    ap.add_argument("--hi", type=int, default=18)
    ap.add_argument("--full-n", type=int, default=190_000)
    ap.add_argument("--quick", action="store_true",
                    help="full-N pallas-bf16 + xla-bf16 only")
    args = ap.parse_args()

    import bench

    bench.wait_for_chip()
    combos = (
        (True, "bfloat16", "pallas-bf16"),
        (False, "bfloat16", "xla-bf16"),
        (False, None, "xla-f32"),
    )
    ns = (args.full_n,) if args.quick else (args.full_n, args.full_n // 4)
    for n_data in ns:
        for use_pallas, dtype, label in (
            combos[:2] if args.quick else combos
        ):
            print(f"[{label} N={n_data}]", flush=True)
            try:
                s = slope(n_data, use_pallas, dtype, args.lo, args.hi)
                print(f"  -> {s * 1e3:.0f} ms/grad ({1 / s:.2f} ge/s)",
                      flush=True)
            except Exception as e:
                print(f"  -> FAILED: {type(e).__name__}: {e}", flush=True)
    # composition overhead check at full N, production backend
    print("[sampler-shaped pallas-bf16]", flush=True)
    sampler_shaped(args.full_n, True, "bfloat16")
    print("[sampler-shaped xla-bf16]", flush=True)
    sampler_shaped(args.full_n, False, "bfloat16")


if __name__ == "__main__":
    main()

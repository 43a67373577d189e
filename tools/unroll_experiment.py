"""Measure the scan-unroll lever on the production grad eval (VERDICT r3 #3).

The per-op profile (PERF_PROFILE.json) attributes the gap between the
measured 23.5 ms/grad and the 4x-forward bound (~15.5 ms) to while-loop
bookkeeping around the scanned layer walk: async activation/cotangent
copies at iteration boundaries and dynamic-update-slice fusions
accumulating per-layer weight grads into the stacked buffers. Unrolling
the scan (flows/maf.py ``scan_unroll``) makes the layer index static so
XLA sees plain dataflow. This driver measures the slope-method grad-eval
rate at several unroll factors on the flagship 2-D shape, plus the
forward slope for the bound.

Run on a QUIET chip (one client rule):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/unroll_experiment.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_DATA = 190_000
ITERS_LO = 24
ITERS_HI = 120


def make_runner(n_iters, unroll, fwd_only=False):
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow

    key = jax.random.PRNGKey(0)
    lam = jax.random.uniform(key, (N_DATA, 2), minval=-1, maxval=1)
    theta = jnp.stack(
        [
            lam[:, 0] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (N_DATA,)),
            0.5 * lam[:, 1] + 0.2 * jax.random.normal(jax.random.PRNGKey(2), (N_DATA,)),
        ],
        -1,
    )
    flow = maf_flow(
        2, n_layers=16, hidden_dims=(150, 150, 150), context_dim=2, seed=0,
        compute_dtype="bfloat16", remat=True, scan_unroll=unroll,
    )
    params = flow.init_params(jax.random.PRNGKey(3))
    bf = BayesianFlow(make_flow_loglik(flow, theta, lam), params, scale_max=0.01)
    pg = jax.value_and_grad(bf.potential)
    q0 = bf.init_positions(jax.random.PRNGKey(4), 1, jitter=0.01)[0]

    @jax.jit
    def run(q, eps):
        def body(carry, _):
            q, acc = carry
            if fwd_only:
                U = bf.potential(q)
                return (q + (eps * 1e-8) * U, acc + U), None
            U, g = pg(q)
            return (q + eps * g, acc + U), None

        (qf, acc), _ = jax.lax.scan(body, (q, 0.0), None, length=n_iters)
        return acc

    return run, q0


def timed(n_iters, unroll, fwd_only=False):
    run, q0 = make_runner(n_iters, unroll, fwd_only)
    t0 = time.time()
    float(run(q0, 1e-12))
    print(
        f"unroll={unroll} iters={n_iters}{' fwd' if fwd_only else ''}: "
        f"compile+run {time.time() - t0:.0f}s", flush=True,
    )
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        float(run(q0, 1e-12 * (1 + r)))
        best = min(best, time.time() - t0)
    return best


def main():
    out = {}
    tf_lo = timed(ITERS_LO, 1, fwd_only=True)
    tf_hi = timed(ITERS_HI, 1, fwd_only=True)
    per_fwd = (tf_hi - tf_lo) / (ITERS_HI - ITERS_LO)
    out["fwd_ms"] = round(per_fwd * 1e3, 3)
    for unroll in (1, 4, 16):
        t_lo = timed(ITERS_LO, unroll)
        t_hi = timed(ITERS_HI, unroll)
        per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
        out[f"unroll{unroll}_ms"] = round(per * 1e3, 3)
        out[f"unroll{unroll}_evals_per_s"] = round(1.0 / per, 2)
        out[f"unroll{unroll}_pct_of_4xfwd"] = round(100 * 4 * per_fwd / per, 1)
        print(json.dumps(out), flush=True)
    with open("/tmp/unroll_experiment.json", "w") as f:
        json.dump(out, f)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

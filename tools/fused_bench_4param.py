"""Slope-method grad-eval benchmark at the 4-param production shape.

Measures the per-layer fused Pallas path (the 4-param production kernel,
18x[512]^5, P=19,049,616, N=190k) — the number to compare against
PERFORMANCE.md's recorded 210 ms/grad-eval (123 TF/s, 62% of v5e bf16
peak). Run after kernel changes (r4: MXU-native TN/NT contractions
replacing in-kernel transposes; optional --scan-unroll for the layer
scan around the kernels).

Run on a QUIET chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_bench_4param.py [unroll]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_DATA = 190_000
ITERS_LO = 4
ITERS_HI = 16


def make_runner(n_iters, unroll):
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow

    key = jax.random.PRNGKey(0)
    lam = jax.random.uniform(key, (N_DATA, 2), minval=-1, maxval=1)
    theta = jnp.stack(
        [
            lam[:, 0] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (N_DATA,)),
            lam[:, 1] + 0.3 * jax.random.normal(jax.random.PRNGKey(2), (N_DATA,)),
            0.5 * lam[:, 0] + 0.2 * jax.random.normal(jax.random.PRNGKey(3), (N_DATA,)),
            0.5 * lam[:, 1] + 0.2 * jax.random.normal(jax.random.PRNGKey(4), (N_DATA,)),
        ],
        -1,
    )
    flow = maf_flow(
        4, n_layers=18, hidden_dims=(512,) * 5, context_dim=2, seed=0,
        use_pallas=True, pallas_tile=512, scan_unroll=unroll,
    )
    params = flow.init_params(jax.random.PRNGKey(5))
    bf = BayesianFlow(make_flow_loglik(flow, theta, lam), params, scale_max=0.01)
    pg = jax.value_and_grad(bf.potential)
    q0 = bf.init_positions(jax.random.PRNGKey(6), 1, jitter=0.01)[0]

    @jax.jit
    def run(q, eps):
        def body(carry, _):
            q, acc = carry
            U, g = pg(q)
            return (q + eps * g, acc + U), None

        (qf, acc), _ = jax.lax.scan(body, (q, 0.0), None, length=n_iters)
        return acc

    return run, q0


def timed(n_iters, unroll):
    run, q0 = make_runner(n_iters, unroll)
    t0 = time.time()
    float(run(q0, 1e-12))
    print(f"iters={n_iters} unroll={unroll}: compile+run {time.time()-t0:.0f}s",
          flush=True)
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        float(run(q0, 1e-12 * (1 + r)))
        best = min(best, time.time() - t0)
    return best


def main():
    unroll = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    t_lo = timed(ITERS_LO, unroll)
    t_hi = timed(ITERS_HI, unroll)
    per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    # matmul flops per grad eval: 4x forward (fwd + recompute + dX + dW)
    widths = [6, 512, 512, 512, 512, 512, 8]
    mm_cols = sum(a * b for a, b in zip(widths[:-1], widths[1:]))
    flops = 4 * 2 * N_DATA * mm_cols * 18
    out = {
        "ms_per_grad_eval": round(per * 1e3, 1),
        "grad_evals_per_s": round(1.0 / per, 3),
        "effective_tflops": round(flops / per / 1e12, 1),
        "unroll": unroll,
    }
    print("FINAL " + json.dumps(out))
    with open(f"/tmp/fused_bench_4param_u{unroll}.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()

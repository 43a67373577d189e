"""Benchmark: leapfrog grad-evals/s/chip on the 2506.05657 workload.

The north-star metric (BASELINE.md): one "grad eval" = one
value_and_grad of the full Bayesian-flow potential — the complete
training-set log-likelihood (N=190,000 points, the reference's 1.9e5
training-set size) through the conditional MAF 16 layers x hidden
[150,150,150] (examples/papers/2506.05657/hmc_maf_exact.py:101) plus the
prior reparameterization — i.e. exactly the inner loop of NUTS/ChEES.

Production configuration measured here: ``compute_dtype="bfloat16"``
(conditioner activations in bf16 — the hot path is HBM-bandwidth-bound,
so halving activation bytes is ~1.9x; see PERFORMANCE.md). Used for
leapfrog gradients with exact f32 accept energies (``--kernel chees``
mixed precision), this does not perturb the posterior.

Methodology: the remote-tunnel dispatch overhead of a jitted program is
large and highly variable (25-400 ms), so the rate is taken from the
SLOPE between two in-program iteration counts — fixed overhead cancels.
Each iteration's position depends on the previous gradient, so no work
can be elided or cached.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is 1.0 by convention.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


N_DATA = 190_000
ITERS_LO = 24
ITERS_HI = 120


def make_runner(n_iters):
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
        compute_dtype="bfloat16",
    )
    params = flow.init_params(jax.random.PRNGKey(3))
    bf = BayesianFlow(make_flow_loglik(flow, theta, lam), params, scale_max=0.01)
    pg = jax.value_and_grad(bf.potential)
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


def timed(n_iters):
    run, q0 = make_runner(n_iters)
    t0 = time.time()
    acc = float(run(q0, 1e-12))  # compile + warm
    print(f"iters={n_iters}: compile+run {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        acc = float(run(q0, 1e-12 * (1 + r)))
        best = min(best, time.time() - t0)
    return best


def main():
    t_lo = timed(ITERS_LO)
    t_hi = timed(ITERS_HI)
    per_eval = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    evals_per_s = 1.0 / per_eval
    print(
        json.dumps(
            {
                "metric": "leapfrog_grad_evals_per_s_per_chip",
                "value": round(evals_per_s, 2),
                "unit": "grad-evals/s (16x[150]^3 MAF, N=190k, bf16-compute)",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

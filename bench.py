"""Benchmark: leapfrog grad-evals/s/chip on the 2506.05657 workload.

The north-star metric (BASELINE.md): one "grad eval" = one
value_and_grad of the full Bayesian-flow potential — the complete
training-set log-likelihood (N=190,000 points, the reference's 1.9e5
training-set size) through the conditional MAF 16 layers x hidden
[150,150,150] (examples/papers/2506.05657/hmc_maf_exact.py:101) plus the
prior reparameterization — i.e. exactly the inner loop of NUTS.

Runs 4 chains x K leapfrog steps in one jitted program on one chip.
Chains execute sequentially (lax.map): at N=190k a single chain already
saturates the chip and vmap's batched matmuls lower ~1.4x slower in
aggregate (29.3 vs 20.9 grad-evals/s measured on v5e) — see
PERFORMANCE.md. The reference publishes no numbers (BASELINE.json
"published": {}), so vs_baseline is reported as 1.0 by convention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow
    from naz_tpu.mcmc.hmc import LeapfrogState, leapfrog

    n_data = 190_000
    n_chains = 4
    n_steps = 64

    key = jax.random.PRNGKey(0)
    lam = jax.random.uniform(key, (n_data, 2), minval=-1, maxval=1)
    theta = jnp.stack(
        [
            lam[:, 0] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n_data,)),
            0.5 * lam[:, 1] + 0.2 * jax.random.normal(jax.random.PRNGKey(2), (n_data,)),
        ],
        -1,
    )

    flow = maf_flow(2, n_layers=16, hidden_dims=(150, 150, 150), context_dim=2, seed=0)
    params = flow.init_params(jax.random.PRNGKey(3))
    bf = BayesianFlow(make_flow_loglik(flow, theta, lam), params, scale_max=0.01)
    pg = jax.value_and_grad(bf.potential)

    q0 = bf.init_positions(jax.random.PRNGKey(4), n_chains, jitter=0.01)
    import time as _t; _t0 = _t.time()
    U0, grad0 = jax.jit(jax.vmap(pg))(q0)
    jax.block_until_ready(U0)
    print(f"first pg compile {_t.time()-_t0:.0f}s", flush=True)
    r0 = 1e-3 * jax.random.normal(jax.random.PRNGKey(5), q0.shape)
    inv_mass = jnp.ones_like(q0)
    step_size = 1e-5

    im1 = jnp.ones((bf.dim,))

    @jax.jit
    def run(q, r, U, grad):
        def chain_scan(args):
            q, r, U, g = args

            def body(s, _):
                return leapfrog(pg, s, step_size, im1), None

            s, _ = jax.lax.scan(
                body, LeapfrogState(q, r, U, g), None, length=n_steps
            )
            return s

        return jax.lax.map(chain_scan, (q, r, U, grad))

    print("data+init done", flush=True)
    # compile + warm
    _t0 = _t.time()
    s = run(q0, r0, U0, grad0)
    jax.block_until_ready(s.q)
    print(f"leapfrog scan compile+run {_t.time()-_t0:.0f}s", flush=True)

    t0 = time.time()
    s = run(s.q, s.r, s.U, s.grad)
    jax.block_until_ready(s.q)
    elapsed = time.time() - t0

    evals = n_steps * n_chains
    evals_per_s = evals / elapsed
    print(
        json.dumps(
            {
                "metric": "leapfrog_grad_evals_per_s_per_chip",
                "value": round(evals_per_s, 2),
                "unit": "grad-evals/s (4 chains x 16x[150]^3 MAF, N=190k)",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

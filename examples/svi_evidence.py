"""BASELINE config #4: SVI posterior over flow weights + importance-sampling
evidence for model comparison.

Counterpart of ``/root/reference/examples/papers/2506.05657/svi_maf_exact.py``
(SVI, 7000 steps, Adam 5e-3) plus ``compute_bic_simpler.py`` and the pyro
``train_importance`` ESS path: fits two flow sizes, compares BIC and IS
evidence.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--svi-steps", type=int, default=2000)
    p.add_argument("--sigma", type=float, default=0.1, help="scale_max (prior width)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from naz_tpu.bayes import (
        BayesianFlow,
        SVIConfig,
        fit_svi,
        importance_evidence,
        make_flow_loglik,
        sample_svi_posterior,
    )
    from naz_tpu.config import FlowSpec
    from naz_tpu.stats import compute_bic
    from naz_tpu.train import MLEConfig, train_mle

    rng = np.random.default_rng(args.seed)
    x = (0.7 * rng.standard_normal((args.n, 2)) + [0.5, -0.2]).astype(np.float32)

    results = {}
    for name, layers, hidden in [("small", 2, (16,)), ("large", 6, (64, 64))]:
        flow = FlowSpec(
            flow_type="maf", dim=2, n_layers=layers, hidden_dims=hidden, seed=args.seed
        ).build()
        mle = train_mle(
            flow,
            x,
            config=MLEConfig(lr=3e-3, max_epochs=200, batch_frac=0.25, patience=30),
        )
        bf = BayesianFlow(make_flow_loglik(flow, x), mle.params, scale_max=args.sigma)
        print(f"[{name}] model complexity: {bf.complexity}")
        svi = fit_svi(
            bf,
            SVIConfig(
                num_steps=args.svi_steps, step_size=5e-3, num_particles=2,
                seed=args.seed, verbose=True,
            ),
        )
        ev = importance_evidence(bf, svi, jax.random.PRNGKey(1), num_samples=1000)
        draws = sample_svi_posterior(bf, svi, jax.random.PRNGKey(2), 200)
        lls = jax.vmap(bf.log_likelihood_flat)(draws["params_flat"])
        bic = float(compute_bic(lls, args.n, bf.complexity))
        results[name] = (ev, bic)
        print(
            f"[{name}] logZ {ev.log_evidence:.1f} +- {ev.log_evidence_se:.2f} "
            f"(IS ESS {ev.ess:.1f}/{ev.num_samples}), BIC {bic:.1f}"
        )

    small_ev, small_bic = results["small"]
    large_ev, large_bic = results["large"]
    pref_ev = "small" if small_ev.log_evidence > large_ev.log_evidence else "large"
    pref_bic = "small" if small_bic < large_bic else "large"
    print(f"evidence prefers: {pref_ev}; BIC prefers: {pref_bic}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

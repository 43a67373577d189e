"""BASELINE config #3: MC-dropout Bayesian flow — predictive density +
epistemic variance from a dropout ensemble.

Counterpart of the reference's dropout conditioners + ``MCDPNormalizingFlow``
(``/root/reference/src/naz/flows/mcdpflow.py:29-56``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--niter", type=int, default=32)
    p.add_argument("--epochs", type=int, default=250)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from naz_tpu.bayes.mcdropout import log_prob_uncertain, sample_uncertain
    from naz_tpu.config import FlowSpec
    from naz_tpu.train import MLEConfig, train_mle

    rng = np.random.default_rng(args.seed)
    x = (0.6 * rng.standard_normal((args.n, 2)) + [1.0, -0.5]).astype(np.float32)

    flow = FlowSpec(
        flow_type="maf",
        dim=2,
        n_layers=4,
        hidden_dims=(64,),
        dropout_rate=args.dropout,
        seed=args.seed,
    ).build()
    res = train_mle(
        flow,
        x,
        config=MLEConfig(
            lr=3e-3, max_epochs=args.epochs, batch_frac=0.2, patience=30,
            dropout=True, verbose=True, sync_every=50,
        ),
    )

    ens = sample_uncertain(flow, res.params, jax.random.PRNGKey(1), args.niter, 20000)
    means = np.asarray(jnp.mean(ens, axis=1))
    print(f"val NLL {res.val_losses[-1]:.4f}")
    print(f"predictive mean {means.mean(0)} +- epistemic spread {means.std(0)}")

    grid = jnp.asarray(
        np.stack(np.meshgrid(np.linspace(-1, 3, 40), np.linspace(-2.5, 1.5, 40)), -1)
        .reshape(-1, 2)
        .astype(np.float32)
    )
    lps = log_prob_uncertain(flow, res.params, jax.random.PRNGKey(2), args.niter, grid)
    dens = np.exp(np.asarray(lps))
    print(
        f"density epistemic CV on a grid: median "
        f"{np.median(dens.std(0) / (dens.mean(0) + 1e-12)):.3f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

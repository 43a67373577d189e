"""Logit-box bounding transform: box [low, high]^D <-> R^D.

Capability parity with ``/root/reference/src/naz/flows/bflow_jax_maf.py:96-105``
and ``src/naz/flows/transforms.py:20-27``; signs here follow the standard
change-of-variables convention (every function returns the log-abs-det of the
Jacobian of the map it applies), which the tests verify against
``jax.jacfwd`` — the reference mixes conventions between its torch and JAX
paths.

forward (``bounding_transform``): x in box -> u = logit((x-low)/(high-low)),
  log|du/dx| = -sum[log y + log1p(-y)] - sum log(high-low),  y=(x-low)/(high-low).
inverse: u -> x = low + (high-low)*sigmoid(u),
  log|dx/du| = sum[log_sigmoid(u) + log_sigmoid(-u)] + sum log(high-low).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bounding_transform(x: jnp.ndarray, low: jnp.ndarray, high: jnp.ndarray):
    """Map box samples to unconstrained space; returns (u, log|du/dx|)."""
    low = jnp.asarray(low)
    high = jnp.asarray(high)
    width = high - low
    y = (x - low) / width
    u = jnp.log(y) - jnp.log1p(-y)
    log_det = -jnp.sum(jnp.log(y) + jnp.log1p(-y), axis=-1) - jnp.sum(jnp.log(width))
    return u, log_det


def inverse_bounding_transform(u: jnp.ndarray, low: jnp.ndarray, high: jnp.ndarray):
    """Map unconstrained samples into the box; returns (x, log|dx/du|)."""
    low = jnp.asarray(low)
    high = jnp.asarray(high)
    width = high - low
    x = low + width * jax.nn.sigmoid(u)
    # d sigmoid(u)/du = sigmoid(u) sigmoid(-u); use softplus for stability.
    log_det = jnp.sum(
        -jax.nn.softplus(-u) - jax.nn.softplus(u), axis=-1
    ) + jnp.sum(jnp.log(width))
    return x, log_det

"""Normalization transforms for flow stacks.

The reference's MAF factory exposes a ``use_batchnorm`` option inserting
pyro ``T.BatchNorm`` layers between flow layers
(``/root/reference/src/naz/flows/transforms.py:133-160``), plus a
batch/instance hybrid ``BatchNorm1d`` conditioner helper
(``src/naz/neural_nets/fully_connected.py:15-25``) and a deprecated
invertible ``ActNorm`` (``__deprecated__/neural_odes/modules.py:225-257``).

In a functional stack, running-statistics batchnorm is an anti-pattern
(hidden mutable state breaks ``vmap``/HMC over weights); the modern
equivalent is **ActNorm** (Kingma & Dhariwal 2018): per-feature affine
with data-dependent initialization, exactly invertible, constant
log-det. ``ActNorm.init_params_from_data`` reproduces batchnorm's
whitening effect at init.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True, eq=False)
class ActNorm:
    dim: int

    def init_params(self, key):
        return {"log_scale": jnp.zeros(self.dim), "shift": jnp.zeros(self.dim)}

    def init_params_from_data(self, x):
        """Initialize so the first batch maps to zero mean / unit variance
        in the data->latent direction."""
        x = jnp.asarray(x)
        return {
            "log_scale": jnp.log(jnp.std(x, axis=0) + 1e-6),
            "shift": jnp.mean(x, axis=0),
        }

    def forward(self, params, x, context=None, dropout_key=None):
        z = (x - params["shift"]) * jnp.exp(-params["log_scale"])
        ld = -jnp.sum(params["log_scale"]) * jnp.ones(x.shape[:-1], x.dtype)
        return z, ld

    def inverse(self, params, z, context=None, dropout_key=None):
        x = z * jnp.exp(params["log_scale"]) + params["shift"]
        ld = jnp.sum(params["log_scale"]) * jnp.ones(z.shape[:-1], z.dtype)
        return x, ld

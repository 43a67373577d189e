"""Normalization transforms for flow stacks.

The reference's MAF factory exposes a ``use_batchnorm`` option inserting
pyro ``T.BatchNorm`` layers between flow layers
(``/root/reference/src/naz/flows/transforms.py:133-160``), plus a
batch/instance hybrid ``BatchNorm1d`` conditioner helper
(``src/naz/neural_nets/fully_connected.py:15-25``) and a deprecated
invertible ``ActNorm`` (``__deprecated__/neural_odes/modules.py:225-257``).

In a functional stack, hidden mutable running statistics are an
anti-pattern (they break ``vmap``/HMC over weights), so two explicit
designs are provided:

* **ActNorm** (Kingma & Dhariwal 2018, the recommended default):
  per-feature affine with data-dependent initialization, exactly
  invertible, constant log-det. ``init_params_from_data`` reproduces
  batchnorm's whitening effect at init.
* **BatchNorm**: the reference's ``T.BatchNorm`` semantics with the
  running statistics **stored in the params pytree** (eval-mode
  normalization — both flow directions use the stored stats, so
  ``log_prob`` stays a pure function for HMC/vmap). Refresh the stats
  explicitly with ``update_stats`` (EMA, the torch ``momentum``
  convention) or ``init_params_from_data`` between training steps.
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


@dataclasses.dataclass(frozen=True, eq=False)
class BatchNorm:
    """Invertible batch normalization with explicit running statistics.

    ``forward`` (data -> latent) whitens with the stored ``mean``/``var``
    then applies the learned ``gamma``/``beta`` affine — the density
    direction of the reference's pyro ``T.BatchNorm`` layers
    (``transforms.py:147-151``). Statistics are plain params entries:
    gradients do not flow into them (``stop_gradient``); update them
    explicitly via :meth:`update_stats`.
    """

    dim: int
    eps: float = 1e-5

    def init_params(self, key):
        return {
            "log_gamma": jnp.zeros(self.dim),
            "beta": jnp.zeros(self.dim),
            "mean": jnp.zeros(self.dim),
            "var": jnp.ones(self.dim),
        }

    def init_params_from_data(self, x):
        x = jnp.asarray(x).reshape(-1, self.dim)
        p = self.init_params(None)
        p["mean"] = jnp.mean(x, axis=0)
        p["var"] = jnp.var(x, axis=0)
        return p

    def update_stats(self, params, x, momentum: float = 0.1):
        """EMA stats refresh (torch convention: new = (1-m)*old + m*batch)."""
        x = jnp.asarray(x).reshape(-1, self.dim)
        return {
            **params,
            "mean": (1 - momentum) * params["mean"] + momentum * jnp.mean(x, axis=0),
            "var": (1 - momentum) * params["var"] + momentum * jnp.var(x, axis=0),
        }

    def _stats(self, params):
        mean = jax.lax.stop_gradient(params["mean"])
        var = jax.lax.stop_gradient(params["var"])
        return mean, jnp.sqrt(var + self.eps)

    def forward(self, params, x, context=None, dropout_key=None):
        mean, std = self._stats(params)
        z = jnp.exp(params["log_gamma"]) * (x - mean) / std + params["beta"]
        ld = jnp.sum(params["log_gamma"] - jnp.log(std))
        return z, ld * jnp.ones(x.shape[:-1], x.dtype)

    def inverse(self, params, z, context=None, dropout_key=None):
        mean, std = self._stats(params)
        x = (z - params["beta"]) * jnp.exp(-params["log_gamma"]) * std + mean
        ld = -jnp.sum(params["log_gamma"] - jnp.log(std))
        return x, ld * jnp.ones(z.shape[:-1], z.dtype)

"""Minimal functional distribution library.

The reference leans on pyro/numpyro distributions (Uniform, Normal,
TruncatedNormal — ``/root/reference/src/naz/flows/bflow.py:36-45``,
``bflow_jax_maf.py:238-257``, ``src/naz/priors/TruncatedNormal.py``). We own
the inference kernels, so we own the distributions too: everything here is a
pure function of its parameters, reparameterization-friendly (samples are
differentiable w.r.t. parameters where that makes sense), and vmappable.

All ``log_prob`` return per-event scalars with batch shape broadcast; no
plate machinery — reductions are explicit at the call site (which is what
lets us shard them with ``psum`` later).
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfc, ndtri, log_ndtr

_LOG_2PI = math.log(2.0 * math.pi)
_SQRT2 = math.sqrt(2.0)


def standard_normal_logpdf(z: jnp.ndarray) -> jnp.ndarray:
    """Sum over the last axis: log N(z; 0, I)."""
    return -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * z.shape[-1] * _LOG_2PI


def normal_logpdf(x, loc, scale):
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * _LOG_2PI


def _normal_cdf(z):
    return 0.5 * erfc(-z / _SQRT2)


@dataclasses.dataclass(frozen=True)
class StandardNormal:
    dim: int

    def log_prob(self, z):
        return standard_normal_logpdf(z)

    def sample(self, key, shape=()):
        return jax.random.normal(key, tuple(shape) + (self.dim,))


@dataclasses.dataclass(frozen=True)
class Normal:
    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, x):
        return normal_logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            tuple(shape), jnp.shape(self.loc), jnp.shape(self.scale)
        )
        return self.loc + self.scale * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class Uniform:
    low: jnp.ndarray
    high: jnp.ndarray

    def log_prob(self, x):
        inside = (x >= self.low) & (x <= self.high)
        lp = -jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            tuple(shape), jnp.shape(self.low), jnp.shape(self.high)
        )
        u = jax.random.uniform(key, shape)
        return self.low + (self.high - self.low) * u


@dataclasses.dataclass(frozen=True)
class TruncatedNormal:
    """Normal(loc, scale) truncated to [low, high].

    Sampling is the inverse-CDF reparameterization (differentiable w.r.t.
    loc/scale), the same construction as the reference's
    ``priors/TruncatedNormal.py:34-77`` but with numerically safer tails
    (log-space normalizer via ``log_ndtr``).
    """

    loc: jnp.ndarray
    scale: jnp.ndarray
    low: jnp.ndarray
    high: jnp.ndarray

    def _alpha_beta(self):
        return (self.low - self.loc) / self.scale, (self.high - self.loc) / self.scale

    def log_normalizer(self):
        a, b = self._alpha_beta()
        # log(Phi(b) - Phi(a)) computed stably: fold to the left tail where
        # log_ndtr is accurate, using Phi(b)-Phi(a) = Phi(-a)-Phi(-b).
        flip = (a + b) > 0
        a_, b_ = jnp.where(flip, -b, a), jnp.where(flip, -a, b)
        log_phi_b = log_ndtr(b_)
        log_phi_a = log_ndtr(a_)
        return log_phi_b + jnp.log1p(-jnp.exp(log_phi_a - log_phi_b))

    def log_prob(self, x):
        lp = normal_logpdf(x, self.loc, self.scale) - self.log_normalizer()
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            tuple(shape),
            jnp.shape(self.loc),
            jnp.shape(self.scale),
            jnp.shape(self.low),
            jnp.shape(self.high),
        )
        a, b = self._alpha_beta()
        u = jax.random.uniform(key, shape, minval=1e-7, maxval=1.0 - 1e-7)
        cdf_a = _normal_cdf(a)
        cdf_b = _normal_cdf(b)
        z = ndtri(cdf_a + u * (cdf_b - cdf_a))
        z = jnp.clip(z, a, b)  # guard inverse-CDF round-off at the edges
        return self.loc + self.scale * z

"""Unified flow-distribution API.

Capability parity with ``/root/reference/src/naz/flows/flow.py:24-129``
(``NormalizingFlow`` with ``log_prob/bounded_log_prob/average_log_prob/
sample``) and the JAX closure ``make_normalizing_flow``
(``bflow_jax_maf.py:196-225``) — but functional: a ``Flow`` is static
configuration; all state lives in an explicit params pytree
``{"transforms": (...), "embedding": ...}`` so the whole object composes
with ``jit``/``vmap``/``grad``/``shard_map``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from naz_tpu.distributions import standard_normal_logpdf
from naz_tpu.ops.bounding import bounding_transform, inverse_bounding_transform


@dataclasses.dataclass(frozen=True, eq=False)
class Flow:
    """A composition of transforms over a standard-normal base.

    ``transforms[0]`` is applied to the data first in the data->latent
    (density) direction. ``bounds=(low, high)`` optionally pins the support to
    a box via the logit bounding transform (applied before the transforms in
    the density direction), matching ``flow.py:81-87``'s bounded density and
    ``bflow_jax_maf.py:220-222``'s bounded sampling.

    ``embedding`` is an optional conditioning embedder with
    ``init_params(key)`` and ``apply(params, raw_context) -> context``
    (reference: ``flow.py:76`` applies ``embedding_net`` to the condition).
    """

    dim: int
    transforms: Tuple[Any, ...]
    bounds: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
    embedding: Optional[Any] = None

    # -- params ------------------------------------------------------------

    def init_params(self, key):
        keys = jax.random.split(key, len(self.transforms) + 1)
        params = {
            "transforms": tuple(
                t.init_params(k) for t, k in zip(self.transforms, keys[:-1])
            )
        }
        if self.embedding is not None:
            params["embedding"] = self.embedding.init_params(keys[-1])
        return params

    def _embed(self, params, context):
        if context is None or self.embedding is None:
            return context
        return self.embedding.apply(params["embedding"], context)

    # -- density -----------------------------------------------------------

    def log_prob(self, params, x, context=None, dropout_key=None):
        """log p(x | context); shape = broadcast batch shape of x/context.

        ``dropout_key`` activates MC-dropout in transforms built with a
        nonzero dropout rate (one mask realization per key).
        """
        x = jnp.asarray(x)
        ld = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        if self.bounds is not None:
            x, d = bounding_transform(x, *self.bounds)
            ld = ld + d
        context = self._embed(params, context)
        for i, (t, p) in enumerate(zip(self.transforms, params["transforms"])):
            k = None if dropout_key is None else jax.random.fold_in(dropout_key, i)
            x, d = t.forward(p, x, context=context, dropout_key=k)
            ld = ld + d
        return standard_normal_logpdf(x) + ld

    def bounded_log_prob(self, params, x, context=None, dropout_key=None):
        """log_prob with -inf outside the box (reference ``flow.py:81-87``)."""
        lp = self.log_prob(params, x, context=context, dropout_key=dropout_key)
        if self.bounds is None:
            return lp
        low, high = self.bounds
        inside = jnp.all((x > low) & (x < high), axis=-1)
        return jnp.where(inside, lp, -jnp.inf)

    def average_log_prob(self, params, x, context=None):
        return jnp.mean(self.log_prob(params, x, context=context))

    # -- sampling ----------------------------------------------------------

    def sample(self, params, key, n: int, context=None, dropout_key=None):
        x, _ = self.sample_and_log_prob(
            params, key, n, context=context, dropout_key=dropout_key
        )
        return x

    def sample_and_log_prob(self, params, key, n: int, context=None, dropout_key=None):
        """Draw n samples; returns (samples, log_prob at the samples).

        Conditional use mirrors the reference sampler
        (``bflow_jax_maf.py:214-223``): a single context row is broadcast
        over the n draws; a batch of contexts of length n gives one draw
        each.
        """
        z = jax.random.normal(key, (n, self.dim))
        lp = standard_normal_logpdf(z)
        context = self._embed(params, context)
        x = z
        n_t = len(self.transforms)
        for i, (t, p) in enumerate(
            zip(reversed(self.transforms), reversed(params["transforms"]))
        ):
            k = (
                None
                if dropout_key is None
                else jax.random.fold_in(dropout_key, n_t - 1 - i)
            )
            x, d = t.inverse(p, x, context=context, dropout_key=k)
            lp = lp - d
        if self.bounds is not None:
            x, d = inverse_bounding_transform(x, *self.bounds)
            lp = lp - d
        return x, lp

"""MC-dropout predictive ensembles.

Capability parity with ``MCDPNormalizingFlow``
(``/root/reference/src/naz/flows/mcdpflow.py:29-56``): keep dropout live at
prediction time and draw ``niter`` dropout-mask realizations, each with its
own batch of flow samples, to build an epistemic-uncertainty ensemble.

TPU-first: the reference's host loop over iterations (``mcdpflow.py:48``)
becomes a ``vmap`` over dropout keys — all realizations run in one program.
Build the flow with ``maf_flow(..., dropout_rate=p)`` (the reference's
dropout conditioner nets, ``src/naz/flows/transforms.py:29-111``) and train
with ``MLEConfig(dropout=True)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_uncertain(flow, params, key, niter: int, n: int, context=None):
    """(niter, n, dim) samples: one dropout realization per leading index."""
    k_noise, k_drop = jax.random.split(jnp.asarray(key))
    noise_keys = jax.random.split(k_noise, niter)
    drop_keys = jax.random.split(k_drop, niter)

    def one(nk, dk):
        return flow.sample(params, nk, n, context=context, dropout_key=dk)

    return jax.vmap(one)(noise_keys, drop_keys)


def log_prob_uncertain(flow, params, key, niter: int, x, context=None):
    """(niter, N) per-datum log-probs across dropout realizations; the
    spread is the MC-dropout epistemic uncertainty on the density."""
    drop_keys = jax.random.split(jnp.asarray(key), niter)

    def one(dk):
        return flow.log_prob(params, x, context=context, dropout_key=dk)

    return jax.vmap(one)(drop_keys)

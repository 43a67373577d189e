"""MADE mask construction (degree-based autoregressive masks).

Semantics are compatible with the reference implementation
(``/root/reference/src/naz/flows/bflow_jax_maf.py:48-72``) so that weights
trained there (or in pyro's ``ConditionalAutoRegressiveNN``) evaluate to
identical outputs when imported — the cheapest cross-validation of the whole
transform stack:

* each of the ``dim`` features gets a *degree* in ``1..dim`` assigned through a
  permutation: feature ``permutation[k]`` has degree ``k + 1`` (so
  ``permutation[0]`` is first in the autoregressive ordering);
* context features are prepended (``[context, x]``) with degree 0 — every
  hidden unit may see all of the context;
* hidden-unit degrees are an (approximately) even spread over the allowed
  range: ``round(linspace(1, dim, H)) - 1`` in ``[0, dim-1]`` when conditional,
  ``round(linspace(1, dim-1, H))`` in ``[1, dim-1]`` when unconditional;
* connectivity: hidden ``>=`` input-degree, output ``>`` hidden-degree
  (strict at the output, so output ``i`` depends only on features of strictly
  lower degree);
* the output is ``n_params`` stacked blocks (e.g. mean and log-scale), each of
  size ``dim``, sharing the degree layout (``tile``-ed degrees).

Masks are built with numpy at trace time (they are static data) and returned
as jnp arrays.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


def _spread_degrees(
    hi: int, h: int, simple: bool, rng: np.random.Generator | None
) -> np.ndarray:
    """Hidden-unit degrees: an even spread of ``linspace(1, hi, h)``.

    ``simple=True`` rounds deterministically (the reference's production
    mode). ``simple=False`` is the reference's *stochastic* masking knob
    (``sample_mask_indices(simple=False)``,
    ``/root/reference/src/naz/flows/bflow_jax_maf.py:48-50``): stochastic
    rounding, ``floor(idx) + Bernoulli(idx - floor(idx))`` — same expected
    degree but randomized tie-breaking, so an ensemble of conditioners
    doesn't share one connectivity pattern. (As written upstream the knob is
    broken twice — ``np.random.bernoulli`` doesn't exist and the flag is
    never forwarded into ``create_mask`` — this implements the intent.)
    """
    idx = np.linspace(1, hi, h)
    if simple:
        return np.round(idx).astype(np.int64)
    frac = idx - np.floor(idx)
    rng = rng if rng is not None else np.random.default_rng()
    return (np.floor(idx) + rng.binomial(1, frac)).astype(np.int64)


def made_degrees(
    dim: int,
    hidden_dims: Sequence[int],
    context_dim: int,
    permutation: np.ndarray,
    simple_masking: bool = True,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, list[np.ndarray], np.ndarray]:
    """Return (input_degrees, hidden_degrees per layer, output_degrees).

    ``input_degrees`` covers the concatenated ``[context, x]`` input (context
    first, degree 0). ``output_degrees`` covers a single ``dim``-sized output
    block (callers tile it for multi-parameter outputs).
    ``simple_masking=False`` uses stochastic degree rounding (needs ``rng``
    for reproducibility); see :func:`_spread_degrees`.
    """
    permutation = np.asarray(permutation)
    if permutation.shape != (dim,):
        raise ValueError(f"permutation must have shape ({dim},), got {permutation.shape}")
    var_degree = np.empty(dim, dtype=np.int64)
    var_degree[permutation] = np.arange(1, dim + 1)

    input_degrees = np.concatenate([np.zeros(context_dim, dtype=np.int64), var_degree])

    hidden = []
    for h in hidden_dims:
        if context_dim > 0:
            deg = _spread_degrees(dim, h, simple_masking, rng) - 1
        else:
            # Unconditional: degree-0 hidden units would be dead (no inputs),
            # so degrees live in [1, dim-1].
            hi = max(dim - 1, 1)
            deg = _spread_degrees(hi, h, simple_masking, rng)
        deg = np.clip(deg, 0 if context_dim > 0 else 1, max(dim - 1, 1))
        hidden.append(deg)

    return input_degrees, hidden, var_degree


def made_masks(
    dim: int,
    context_dim: int,
    hidden_dims: Sequence[int],
    permutation: np.ndarray,
    n_params: int = 2,
    dtype=jnp.float32,
    simple_masking: bool = True,
    rng: np.random.Generator | None = None,
) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Build the masked-MLP connectivity masks for one MADE conditioner.

    Returns ``(masks, skip_mask)`` where ``masks[k]`` has shape
    ``(out_k, in_k)`` matching weight matrices of a ``len(hidden_dims)+1``-layer
    MLP mapping ``context_dim + dim -> hidden_dims[...] -> dim * n_params``,
    and ``skip_mask`` has shape ``(dim * n_params, context_dim + dim)`` for an
    optional input->output skip connection (strict inequality, like the
    output mask).
    """
    if not hidden_dims:
        raise ValueError("need at least one hidden layer")
    input_degrees, hidden_degrees, var_degree = made_degrees(
        dim, hidden_dims, context_dim, permutation, simple_masking, rng
    )
    output_degrees = np.tile(var_degree, n_params)

    masks = [(hidden_degrees[0][:, None] >= input_degrees[None, :])]
    for k in range(1, len(hidden_dims)):
        masks.append(hidden_degrees[k][:, None] >= hidden_degrees[k - 1][None, :])
    masks.append(output_degrees[:, None] > hidden_degrees[-1][None, :])
    skip_mask = output_degrees[:, None] > input_degrees[None, :]

    return (
        [jnp.asarray(m, dtype=dtype) for m in masks],
        jnp.asarray(skip_mask, dtype=dtype),
    )


def random_permutations(rng: np.random.Generator, dim: int, n_layers: int) -> np.ndarray:
    """Stack of per-flow-layer feature permutations, shape (n_layers, dim).

    The reference draws a fresh random permutation per layer
    (``bflow_jax_maf.py:118-125``); we do the same but from an explicit
    generator so flows are reproducible.
    """
    return np.stack([rng.permutation(dim) for _ in range(n_layers)])

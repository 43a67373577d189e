"""Import weights exported from the reference implementation.

The reference bridges its torch-trained MLE flows into JAX with
``torch_to_jax`` (``/root/reference/src/naz/flows/bflow_jax_maf.py:26-46``),
producing per-layer weight/bias tuples, MADE masks, skip masks and
permutations. :func:`flow_from_reference_arrays` accepts exactly that
structure (as numpy/jnp arrays — no torch required) and builds an
equivalent flow here:

* the reference's orientation is one-pass **sampling** / sequential
  density (``bflow_jax_maf.py:173-193``), which is our stack with
  ``invert=True``;
* the reference's masks are used verbatim (stacked), so imported weights
  evaluate identically — the cheapest cross-validation of the whole
  transform stack (SURVEY.md §7 "parity");
* layer composition order is preserved: reference ``sample`` applies layer
  0 first from the latent side, which matches our ``invert=True`` inverse.

To export from a live reference checkpoint (requires torch + the reference
package), run its ``torch_to_jax`` and save the arrays; this module only
needs the arrays.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from naz_tpu.flows.flow import Flow
from naz_tpu.flows.maf import MaskedAutoregressiveFlow


def flow_from_reference_arrays(
    params: Sequence[Sequence[tuple]],
    masks: Sequence[Sequence[np.ndarray]],
    permutations: Sequence[np.ndarray],
    context_dim: int = 0,
    bounds=None,
    activation=jnp.tanh,
):
    """Build (Flow, params_pytree) from ``torch_to_jax``-format arrays.

    Args:
      params: per flow layer, per MLP layer, ``(W (out,in), b (out,))``.
      masks: per flow layer, the MADE masks matching each weight.
      permutations: per flow layer, the feature permutation.
    """
    n_layers = len(params)
    if not (len(masks) == len(permutations) == n_layers):
        raise ValueError("params/masks/permutations length mismatch")
    n_mlp = len(params[0])

    mask_stacked = tuple(
        jnp.stack([jnp.asarray(masks[l][k], jnp.float32) for l in range(n_layers)])
        for k in range(n_mlp)
    )
    params_stacked = tuple(
        {
            "w": jnp.stack([jnp.asarray(params[l][k][0]) for l in range(n_layers)]),
            "b": jnp.stack([jnp.asarray(params[l][k][1]) for l in range(n_layers)]),
        }
        for k in range(n_mlp)
    )

    out_dim2, hidden_last = mask_stacked[-1].shape[1:]
    dim = out_dim2 // 2
    cin = mask_stacked[0].shape[-1]
    if cin != context_dim + dim:
        raise ValueError(
            f"mask input width {cin} != context_dim {context_dim} + dim {dim}"
        )
    hidden_dims = tuple(int(m.shape[1]) for m in mask_stacked[:-1])

    transform = MaskedAutoregressiveFlow(
        dim=dim,
        context_dim=context_dim,
        hidden_dims=hidden_dims,
        n_layers=n_layers,
        masks=mask_stacked,
        permutations=jnp.asarray(np.stack([np.asarray(p) for p in permutations])),
        activation=activation,
        invert=True,  # reference orientation: fast sampling, sequential density
    )
    flow = Flow(dim=dim, transforms=(transform,), bounds=bounds)
    return flow, {"transforms": (params_stacked,)}

"""Masked dense layers and the MADE conditioner MLP (pure-jnp path).

This is the XLA reference path; the Pallas fused kernel
(``naz_tpu.ops.pallas.made_mlp``) implements the same contract with the
batch tile resident in VMEM across the whole MLP. Capability parity with
``/root/reference/src/naz/flows/bflow_jax_maf.py:74-77,135-165``.

Design notes (TPU-first):

* weights are stored ``(out, in)`` and applied as ``x @ (w * mask).T`` — the
  mask multiply is O(out*in) on the VPU, negligible next to the batched
  matmul on the MXU, and XLA hoists it out of ``scan`` bodies when the
  weights are loop-invariant;
* matmuls request ``preferred_element_type=jnp.float32`` so bf16 params still
  accumulate in f32 on the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def masked_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    compute_dtype=None,
) -> jnp.ndarray:
    """``x @ (w * mask).T + b`` with f32 MXU accumulation. w, mask: (out, in).

    ``compute_dtype=jnp.bfloat16`` casts the matmul *operands* (activations
    and masked weights) while keeping f32 accumulation and f32 bias add.
    At the reference's production shape ((190k, 150) activations) the
    conditioner chain is HBM-bandwidth-bound; halving activation bytes is
    worth ~3x measured throughput (PERFORMANCE.md). The density becomes a
    (deterministic) bf16-rounded approximation — see
    ``MaskedAutoregressiveFlow.compute_dtype`` for where this is sound.
    """
    wm = w * mask
    if compute_dtype is not None:
        # genuinely low-precision layer: bf16 operands AND bf16 output (MXU
        # still accumulates f32 internally). Because the primal is bf16,
        # autodiff's cotangents are bf16 too — both backward matmuls and
        # the elementwise backward run at halved HBM bytes, which is the
        # whole win at bandwidth-bound shapes. Param grads recover f32 at
        # the astype boundary below.
        cd = jnp.dtype(compute_dtype)
        return jnp.dot(x.astype(cd), wm.T.astype(cd)) + b.astype(cd)
    y = jnp.dot(x, wm.T, preferred_element_type=jnp.float32)
    return y + b


def made_mlp(
    x: jnp.ndarray,
    params: Sequence[dict],
    masks: Sequence[jnp.ndarray],
    *,
    context: Optional[jnp.ndarray] = None,
    activation: Callable = jnp.tanh,
    n_params: int = 2,
    skip_weight: Optional[jnp.ndarray] = None,
    skip_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> tuple[jnp.ndarray, ...]:
    """Evaluate one MADE conditioner.

    Args:
      x: (..., dim) features.
      params: per-MLP-layer dicts ``{"w": (out,in), "b": (out,)}``; the final
        layer maps to ``dim * n_params`` outputs laid out as ``n_params``
        contiguous blocks (block 0 = mean, block 1 = log-scale for affine).
      masks: matching connectivity masks from :func:`naz_tpu.ops.masks.made_masks`.
      context: optional (..., context_dim) conditioning, prepended to ``x``.
      skip_weight/skip_mask: optional masked input->output skip connection
        (the reference exposes ``skip_connections`` but its JAX path reuses the
        output weight, ``bflow_jax_maf.py:152-153``; we carry a dedicated
        weight so the option is actually well-formed).
      dropout_rate/dropout_key: inverted dropout after every hidden
        activation (the reference's MC-dropout conditioners,
        ``src/naz/flows/transforms.py:29-95``). The mask depends only on the
        hidden-layer index folded into ``dropout_key``, so repeated
        conditioner evaluations inside the sequential inversion see
        identical masks (a requirement the reference meets by bypassing
        pyro's transform cache, ``mcdpflow.py:12-25``).

    Returns:
      tuple of ``n_params`` arrays, each (..., dim).
    """
    if context is not None:
        context = jnp.broadcast_to(context, x.shape[:-1] + (context.shape[-1],))
        h = jnp.concatenate([context, x], axis=-1)
    else:
        h = x
    x_full = h

    use_dropout = dropout_rate > 0.0 and dropout_key is not None
    for k, (layer, mask) in enumerate(zip(params[:-1], masks[:-1])):
        h = activation(masked_linear(h, layer["w"], layer["b"], mask, compute_dtype))
        if use_dropout:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_key, k), 1.0 - dropout_rate, h.shape
            )
            h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    out = masked_linear(h, params[-1]["w"], params[-1]["b"], masks[-1], compute_dtype)
    if compute_dtype is not None:
        # hand mean / log-scale blocks back in f32: the affine update, the
        # log-det sum over 1.9e5 points, and the base log-prob stay exact
        out = out.astype(x.dtype)

    if skip_weight is not None:
        out = out + jnp.dot(
            x_full, (skip_weight * skip_mask).T, preferred_element_type=jnp.float32
        )

    dim = x.shape[-1]
    return tuple(out[..., k * dim : (k + 1) * dim] for k in range(n_params))

"""Fused MAF sampling kernels: the sequential D-pass inversion in VMEM.

Sampling (and the reference-orientation density) inverts each MADE layer
by fixed-point iteration in autoregressive-degree order — ``dim`` full
conditioner passes per layer (``bflow_jax_maf.py:186-190``; our
``MaskedAutoregressiveFlow._sequential``). Under XLA every one of those
passes round-trips its (B, hidden) activations through HBM, and the
(B, dim) carry makes ``dim x n_layers`` kernel launches. These kernels run
the whole fixed-point iteration for a batch tile while it is VMEM-resident:

* ``fused_made_sample_stack`` — every layer's weights resident, ALL
  ``n_layers x dim`` conditioner passes in ONE ``pallas_call`` (small
  models, e.g. the 2-D 16x[150]^3 config whose stacked weights are ~7 MB);
* ``fused_made_sample_layer`` — one layer per call (``dim`` passes),
  scanned over layers from the flow, for models whose stacked weights
  outgrow the ~16 MB VMEM (4-param 18x[512]^5).

Inference-only: no custom VJP here. The flow attaches a jnp-path VJP
(gradients through sampling are rare — SVI reparameterization is over
*weights*, not flow samples) so differentiation still works.

This is the PPD-generation hot path: the reference's calibration study
draws 10^6 flow samples per posterior draw (``calibrate.py:145-150``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cast(a, bf16):
    return a.astype(jnp.bfloat16) if bf16 else a


def _dot_nn(a, b, bf16):
    return jnp.dot(_cast(a, bf16), _cast(b, bf16), preferred_element_type=jnp.float32)


def _chain(xf, ws, bs, bf16):
    """MLP chain on (T, cin) with in-major 2-D weights."""
    h = xf
    for k in range(len(ws) - 1):
        h = jnp.tanh(_dot_nn(h, ws[k], bf16) + bs[k])
    return _dot_nn(h, ws[-1], bf16) + bs[-1]


def _invert_layer(x_target, ctx, ws, bs, dim, cond, clip_lo, clip_hi, bf16):
    """Solve elem_fwd(x, cond(x)) = x_target by ``dim`` degree-order passes.

    Returns (x, sum(s(x))) — the inverse map and its log-det contribution.
    """
    xi = jnp.zeros_like(x_target)
    s = jnp.zeros_like(x_target)
    for _ in range(dim):
        xf = jnp.concatenate([ctx, xi], axis=-1) if cond else xi
        out = _chain(xf, ws, bs, bf16)
        mu = out[:, :dim]
        s = jnp.clip(out[:, dim : 2 * dim], clip_lo, clip_hi)
        xi = mu + x_target * jnp.exp(s)
    return xi, jnp.sum(s, axis=-1, keepdims=True)


def _stack_body(*refs, dim, n_layers, n_mlp, cond, clip_lo, clip_hi, bf16):
    # refs: z, [ctx], w_0..w_{K-1} (L,in,out), b_0.. (L,1,out), x_out, ld_out
    i = 0
    z_ref = refs[i]; i += 1
    ctx = None
    if cond:
        ctx = refs[i][:]; i += 1
    ws = refs[i : i + n_mlp]; i += n_mlp
    bs = [refs[i + k][:] for k in range(n_mlp)]; i += n_mlp
    x_ref, ld_ref = refs[i], refs[i + 1]

    x = z_ref[:]
    ld = jnp.zeros((x.shape[0], 1), dtype=x.dtype)
    # layers invert in reverse composition order (scan reverse=True in
    # MaskedAutoregressiveFlow._sequential)
    for l in range(n_layers - 1, -1, -1):
        wl = [ws[k][l] for k in range(n_mlp)]
        bl = [bs[k][l] for k in range(n_mlp)]
        x, s_sum = _invert_layer(x, ctx, wl, bl, dim, cond, clip_lo, clip_hi, bf16)
        ld = ld + s_sum
    x_ref[:] = x
    ld_ref[:] = ld


def _layer_body(*refs, dim, n_mlp, cond, clip_lo, clip_hi, bf16):
    # refs: z, [ctx], w_0.. (in,out), b_0.. (1,out), x_out, ld_out
    i = 0
    z_ref = refs[i]; i += 1
    ctx = None
    if cond:
        ctx = refs[i][:]; i += 1
    ws = [refs[i + k][:] for k in range(n_mlp)]; i += n_mlp
    bs = [refs[i + k][:] for k in range(n_mlp)]; i += n_mlp
    x_ref, ld_ref = refs[i], refs[i + 1]

    x, s_sum = _invert_layer(
        z_ref[:], ctx, ws, bs, dim, cond, clip_lo, clip_hi, bf16
    )
    x_ref[:] = x
    ld_ref[:] = s_sum


def _pad_batch(a, tile):
    b = a.shape[0]
    pad = (-b) % tile
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, b


def _whole_spec(a):
    zeros = (0,) * a.ndim
    return pl.BlockSpec(a.shape, lambda i: zeros, memory_space=pltpu.VMEM)


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _call_sample(kernel_body, z, ctx, weights, biases, dim, tile, interpret, kw):
    cond = ctx.shape[-1] > 0
    z_pad, b_true = _pad_batch(z, tile)
    B = z_pad.shape[0]
    in_arrays = [z_pad]
    in_specs = [_row_spec(tile, dim)]
    if cond:
        ctx_pad, _ = _pad_batch(ctx, tile)
        in_arrays.append(ctx_pad)
        in_specs.append(_row_spec(tile, ctx.shape[-1]))
    in_arrays += [*weights, *biases]
    in_specs += [_whole_spec(a) for a in (*weights, *biases)]
    x, ld = pl.pallas_call(
        functools.partial(kernel_body, dim=dim, cond=cond, **kw),
        grid=(B // tile,),
        in_specs=in_specs,
        out_specs=(_row_spec(tile, dim), _row_spec(tile, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((B, dim), z_pad.dtype),
            jax.ShapeDtypeStruct((B, 1), z_pad.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*in_arrays)
    return x[:b_true], ld[:b_true, 0]


def fused_made_sample_stack(
    z,
    ctx,
    weights,
    biases,
    dim: int,
    clip_lo: float = -5.0,
    clip_hi: float = 3.0,
    tile: int = 2048,
    interpret: bool = False,
    bf16: bool = True,
):
    """Whole-flow fused sampling: latent -> data + log|det dx/dz|.

    ``weights``: per-MLP-layer stacked (n_layers, in_k, out_k), pre-masked,
    in-major; ``biases``: (n_layers, 1, out_k). Layer order is the forward
    (data->latent) order; the kernel walks it in reverse.
    """
    n_mlp = len(weights)
    n_layers = weights[0].shape[0]
    kw = dict(
        n_layers=n_layers, n_mlp=n_mlp, clip_lo=clip_lo, clip_hi=clip_hi,
        bf16=bf16,
    )
    return _call_sample(
        _stack_body, z, ctx, tuple(weights), tuple(biases), dim, tile,
        interpret, kw,
    )


def fused_made_sample_layer(
    z,
    ctx,
    weights,
    biases,
    dim: int,
    clip_lo: float = -5.0,
    clip_hi: float = 3.0,
    tile: int = 1024,
    interpret: bool = False,
    bf16: bool = True,
):
    """One layer's ``dim``-pass inversion; scan this over layers in reverse.

    ``weights``: per-MLP-layer (in_k, out_k), pre-masked, in-major;
    ``biases``: (1, out_k). Returns (x, sum_s) for this layer.
    """
    kw = dict(n_mlp=len(weights), clip_lo=clip_lo, clip_hi=clip_hi, bf16=bf16)
    return _call_sample(
        _layer_body, z, ctx, tuple(weights), tuple(biases), dim, tile,
        interpret, kw,
    )

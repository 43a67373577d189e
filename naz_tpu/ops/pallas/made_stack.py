"""Whole-stack fused MAF Pallas kernel: all flow layers in one ``pallas_call``.

The NUTS/MLE hot loop (``SURVEY.md`` §3.2) is, per gradient evaluation, 16
MADE conditioners + affine updates over the full training set. The
per-layer kernel (``made_fused.py``) already keeps one conditioner chain in
VMEM, but still launches ``n_layers`` separate kernels per pass, each with
its own grid walk — at 190k/tile grid steps per layer the fixed per-step
cost dominates and it loses to XLA. Measurements (`/tmp/layout_bench4`,
PERFORMANCE.md) show the XLA path itself is **HBM-bandwidth-bound**: every
matmul of the conditioner round-trips a (190k, hidden) activation through
HBM (~23 TF/s effective at these shapes vs ~800 GB/s streaming).

This kernel walks the ENTIRE flow — all ``n_layers`` conditioner chains,
affine updates, and the log-det accumulation — for a batch tile while it is
resident in VMEM:

* the stacked weights of all layers (~3 MB at the 16x[150]^3 reference
  config) are broadcast once into VMEM and stay there for the whole grid;
* per grid step the only HBM traffic is the (tile, dim) inputs and
  (tile, dim)+(tile, 1) outputs — activations never touch HBM;
* forward additionally emits the per-layer inputs ``xs`` packed as
  (batch, n_layers*dim) — ``dim`` is 2–4 so this is tiny — which lets the
  backward kernel skip re-deriving the x-chain;
* backward is flash-style: per tile it re-computes each layer's hidden
  activations from the stored ``xs`` and accumulates weight/bias gradients
  across the sequential TPU grid into VMEM-resident accumulator refs
  (zero-initialized at program 0).

Numerics match the jnp path: tanh hiddens, log-scale clip window with a
masked gradient, f32 accumulation (operands cast to bf16 for the MXU by
default — the same effective precision XLA uses for f32 matmuls on TPU).

Weights are passed pre-masked and pre-transposed to ``(n_layers, in, out)``
so every forward dot is a plain NN matmul; the backward uses
``dot_general`` contractions (TN for weight grads, NT for input grads) —
all three patterns are MXU-native, no in-kernel transposes.
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
    """(T, K) @ (K, N) -> (T, N), f32 accumulation."""
    return jnp.dot(_cast(a, bf16), _cast(b, bf16), preferred_element_type=jnp.float32)


def _dot_tn(a, b, bf16):
    """(T, M), (T, N) -> (M, N): contract the batch dim (weight grads)."""
    return lax.dot_general(
        _cast(a, bf16), _cast(b, bf16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_nt(a, b, bf16):
    """(T, N), (K, N) -> (T, K): contract the out dim (input grads)."""
    return lax.dot_general(
        _cast(a, bf16), _cast(b, bf16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conditioner_chain(xf, ws, bs, l, bf16, keep_hiddens=False):
    """Run layer ``l``'s MLP on (T, cin) ``xf``; return out (+ hiddens)."""
    hs = [xf]
    h = xf
    for k in range(len(ws) - 1):
        h = jnp.tanh(_dot_nn(h, ws[k][l], bf16) + bs[k][l])
        if keep_hiddens:
            hs.append(h)
        else:
            hs = [h]  # keep only the live activation
    out = _dot_nn(h, ws[-1][l], bf16) + bs[-1][l]
    if keep_hiddens:
        return out, hs
    return out


def _forward_body(*refs, dim, n_layers, n_mlp, cond, clip_lo, clip_hi, bf16):
    # refs: x, [ctx], w_0..w_{K-1}, b_0..b_{K-1}, z, ld, xs
    i = 0
    x_ref = refs[i]; i += 1
    ctx = None
    if cond:
        ctx = refs[i][:]; i += 1
    ws = refs[i : i + n_mlp]; i += n_mlp
    bs = [refs[i + k][:] for k in range(n_mlp)]; i += n_mlp
    # biases are (L, 1, out) blocks; bs[k][l] -> (1, out), broadcasts over T
    z_ref, ld_ref, xs_ref = refs[i], refs[i + 1], refs[i + 2]

    x = x_ref[:]
    ld = jnp.zeros((x.shape[0], 1), dtype=x.dtype)
    for l in range(n_layers):
        # store layer-l input incrementally (keeping all of them live as
        # values would cost n_layers lane-padded (T, 128) registers)
        xs_ref[:, l * dim : (l + 1) * dim] = x
        xf = jnp.concatenate([ctx, x], axis=-1) if cond else x
        out = _conditioner_chain(xf, ws, bs, l, bf16)
        mu = out[:, :dim]
        s = jnp.clip(out[:, dim : 2 * dim], clip_lo, clip_hi)
        ld = ld - jnp.sum(s, axis=-1, keepdims=True)
        x = (x - mu) * jnp.exp(-s)
    z_ref[:] = x
    ld_ref[:] = ld


def _backward_body(*refs, dim, n_layers, n_mlp, cond, clip_lo, clip_hi, bf16):
    # refs: [ctx], w_0.., b_0.., xs, g_z, g_ld | dx, [dctx], dw_0.., db_0..
    i = 0
    ctx = None
    if cond:
        ctx = refs[i][:]; i += 1
    ws = refs[i : i + n_mlp]; i += n_mlp
    bs = [refs[i + k][:] for k in range(n_mlp)]; i += n_mlp
    xs_ref, g_z_ref, g_ld_ref = refs[i], refs[i + 1], refs[i + 2]; i += 3
    dx_ref = refs[i]; i += 1
    dctx_ref = None
    if cond:
        dctx_ref = refs[i]; i += 1
    dws = refs[i : i + n_mlp]; i += n_mlp
    dbs = refs[i : i + n_mlp]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (*dws, *dbs):
            r[:] = jnp.zeros_like(r)

    g_x = g_z_ref[:]
    g_ld = g_ld_ref[:]  # (T, 1)
    dctx = jnp.zeros_like(ctx) if cond else None

    for l in range(n_layers - 1, -1, -1):
        x = xs_ref[:, l * dim : (l + 1) * dim]
        xf = jnp.concatenate([ctx, x], axis=-1) if cond else x
        out, hs = _conditioner_chain(xf, ws, bs, l, bf16, keep_hiddens=True)

        mu = out[:, :dim]
        s_raw = out[:, dim : 2 * dim]
        s = jnp.clip(s_raw, clip_lo, clip_hi)
        e = jnp.exp(-s)
        z = (x - mu) * e

        # z = (x - mu) * e;  ld += -sum(s)
        g_mu = -g_x * e
        g_s = -g_x * z - g_ld
        g_s = jnp.where((s_raw > clip_lo) & (s_raw < clip_hi), g_s, 0.0)
        g_out = jnp.concatenate([g_mu, g_s], axis=-1)

        # MLP backward (recomputed hiddens)
        dws[-1][l, :, :] += _dot_tn(hs[-1], g_out, bf16)
        dbs[-1][l, :, :] += jnp.sum(g_out, axis=0, keepdims=True)
        g_h = _dot_nt(g_out, ws[-1][l], bf16)
        for k in range(n_mlp - 2, -1, -1):
            g_pre = g_h * (1.0 - hs[k + 1] * hs[k + 1])
            dws[k][l, :, :] += _dot_tn(hs[k], g_pre, bf16)
            dbs[k][l, :, :] += jnp.sum(g_pre, axis=0, keepdims=True)
            g_h = _dot_nt(g_pre, ws[k][l], bf16)

        if cond:
            dctx = dctx + g_h[:, : ctx.shape[-1]]
            g_in = g_h[:, ctx.shape[-1] :]
        else:
            g_in = g_h
        # direct dependence of z_l on x_l
        g_x = g_in + g_x * e

    dx_ref[:] = g_x
    if cond:
        dctx_ref[:] = dctx


def _pad_batch(a, tile):
    b = a.shape[0]
    pad = (-b) % tile
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, b


def _whole_spec(a):
    zeros = (0,) * a.ndim
    return pl.BlockSpec(a.shape, lambda i: zeros, memory_space=pltpu.VMEM)


def _whole_specs(arrs):
    return [_whole_spec(a) for a in arrs]


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_made_stack(
    x,
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
    """Whole-flow fused forward: (z, logdet) for a stack of MAF layers.

    Args:
      x: (B, dim) data.
      ctx: (B, c) context, or a (B, 0) array when unconditional.
      weights: per-MLP-layer stacked weights, each (n_layers, in_k, out_k),
        pre-masked and pre-transposed (in-major).
      biases: matching (n_layers, 1, out_k).
    Returns: (z (B, dim), logdet (B,)).
    """
    z, ld, _ = _stack_forward(
        x, ctx, tuple(weights), tuple(biases), dim, clip_lo, clip_hi, tile,
        interpret, bf16,
    )
    return z, ld


def _stack_forward(x, ctx, weights, biases, dim, clip_lo, clip_hi, tile, interpret, bf16):
    n_mlp = len(weights)
    n_layers = weights[0].shape[0]
    cond = ctx.shape[-1] > 0
    x_pad, b_true = _pad_batch(x, tile)
    B = x_pad.shape[0]
    grid = (B // tile,)

    kernel = functools.partial(
        _forward_body, dim=dim, n_layers=n_layers, n_mlp=n_mlp, cond=cond,
        clip_lo=clip_lo, clip_hi=clip_hi, bf16=bf16,
    )
    in_arrays = [x_pad]
    in_specs = [_row_spec(tile, dim)]
    if cond:
        ctx_pad, _ = _pad_batch(ctx, tile)
        in_arrays.append(ctx_pad)
        in_specs.append(_row_spec(tile, ctx.shape[-1]))
    in_arrays += [*weights, *biases]
    in_specs += _whole_specs(weights) + _whole_specs(biases)

    z, ld, xs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            _row_spec(tile, dim),
            _row_spec(tile, 1),
            _row_spec(tile, n_layers * dim),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, dim), x_pad.dtype),
            jax.ShapeDtypeStruct((B, 1), x_pad.dtype),
            jax.ShapeDtypeStruct((B, n_layers * dim), x_pad.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*in_arrays)
    return z[:b_true], ld[:b_true, 0], xs


def _fwd(x, ctx, weights, biases, dim, clip_lo, clip_hi, tile, interpret, bf16):
    z, ld, xs = _stack_forward(
        x, ctx, tuple(weights), tuple(biases), dim, clip_lo, clip_hi, tile,
        interpret, bf16,
    )
    return (z, ld), (ctx, tuple(weights), tuple(biases), xs, x.shape[0])


def _bwd(dim, clip_lo, clip_hi, tile, interpret, bf16, res, g):
    ctx, weights, biases, xs, b_true = res
    g_z, g_ld = g
    n_mlp = len(weights)
    n_layers = weights[0].shape[0]
    cond = ctx.shape[-1] > 0

    xs_pad, _ = _pad_batch(xs, tile)
    g_z_pad, _ = _pad_batch(g_z, tile)
    g_ld_pad, _ = _pad_batch(g_ld.reshape(-1, 1), tile)
    B = xs_pad.shape[0]
    grid = (B // tile,)

    kernel = functools.partial(
        _backward_body, dim=dim, n_layers=n_layers, n_mlp=n_mlp, cond=cond,
        clip_lo=clip_lo, clip_hi=clip_hi, bf16=bf16,
    )
    in_arrays = []
    in_specs = []
    if cond:
        ctx_pad, _ = _pad_batch(ctx, tile)
        in_arrays.append(ctx_pad)
        in_specs.append(_row_spec(tile, ctx.shape[-1]))
    in_arrays += [*weights, *biases, xs_pad, g_z_pad, g_ld_pad]
    in_specs += _whole_specs(weights) + _whole_specs(biases)
    in_specs += [
        _row_spec(tile, n_layers * dim),
        _row_spec(tile, dim),
        _row_spec(tile, 1),
    ]

    out_specs = [_row_spec(tile, dim)]
    out_shape = [jax.ShapeDtypeStruct((B, dim), xs_pad.dtype)]
    if cond:
        out_specs.append(_row_spec(tile, ctx.shape[-1]))
        out_shape.append(jax.ShapeDtypeStruct((B, ctx.shape[-1]), xs_pad.dtype))
    out_specs += _whole_specs(weights) + _whole_specs(biases)
    out_shape += [jax.ShapeDtypeStruct(w.shape, w.dtype) for w in weights]
    out_shape += [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in biases]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*in_arrays)

    i = 0
    dx = outs[i][:b_true]; i += 1
    if cond:
        dctx = outs[i][:b_true]; i += 1
    else:
        dctx = jnp.zeros_like(ctx)
    dws = tuple(outs[i : i + n_mlp]); i += n_mlp
    dbs = tuple(outs[i : i + n_mlp])
    return dx, dctx, dws, dbs


fused_made_stack.defvjp(_fwd, _bwd)

"""Fused MADE-conditioner + affine-update Pallas kernel.

The NUTS/MLE hot loop is, per flow layer, a masked MLP over the full
training set followed by the elementwise affine update
(``SURVEY.md`` §3.2: cost per leapfrog ∝ layers x masked matmuls over
N_data). Under plain XLA each matmul round-trips its (N, hidden)
activation through HBM; this kernel walks the **whole conditioner chain
and the affine update for a batch tile while it is resident in VMEM** —
HBM traffic drops to reading the inputs and writing (z, logdet) once.

* forward: one grid over batch tiles; weights (pre-masked outside — the
  mask multiply is O(H^2), negligible, and keeps the kernel generic) are
  broadcast to every tile; hidden activations never leave VMEM.
* backward: custom VJP, flash-style — the backward kernel **recomputes**
  the tile's activations in VMEM (nothing saved in HBM beyond the inputs)
  and accumulates weight/bias gradients across the sequential TPU grid
  into its output refs (zero-initialized at program 0).
* numerics match the jnp path exactly: tanh hidden activations, log-scale
  clipped to the configured window (clip gradient handled in the VJP).

Use through ``MaskedAutoregressiveFlow(use_pallas=True)``; anything the
kernel does not support (odd dtypes, non-tanh activations) falls back to
the pure-jnp path. ``interpret=True`` runs on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _make_dot(bf16: bool):
    """MXU matmul; with ``bf16`` the operands are cast to bfloat16 with f32
    accumulation — the same effective precision XLA uses by default for f32
    matmuls on TPU (and ~2x the MXU rate of true-f32 passes)."""
    if not bf16:
        return lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return lambda a, b: jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _cast(a, bf16):
    return a.astype(jnp.bfloat16) if bf16 else a


def _dot_nt(a, w, bf16):
    """(T, in) x (out, in) -> (T, out): contract the trailing dims.

    The weights are stored out-major; contracting with dot_general instead
    of materializing ``w.T`` keeps the pass MXU-native — Mosaic otherwise
    inserts a relayout of the (out, in) block on every use (measurable at
    the 512-wide 4-param shape where this kernel is the production path).
    """
    return jax.lax.dot_general(
        _cast(a, bf16), _cast(w, bf16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_tn(g, h, bf16):
    """(T, out), (T, in) -> (out, in): contract the batch dim — the
    weight-grad epilogue without the explicit ``g.T`` transpose."""
    return jax.lax.dot_general(
        _cast(g, bf16), _cast(h, bf16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_body(x_full_ref, *refs, dim, n_layers, clip_lo, clip_hi, bf16):
    # refs: w0..w{L-1}, b0..b{L-1}, z_ref, ld_ref
    ws = refs[:n_layers]
    bs = refs[n_layers : 2 * n_layers]
    z_ref, ld_ref = refs[2 * n_layers], refs[2 * n_layers + 1]
    h = x_full_ref[:]
    for k in range(n_layers - 1):
        h = jnp.tanh(_dot_nt(h, ws[k][:], bf16) + bs[k][:])
    out = _dot_nt(h, ws[-1][:], bf16) + bs[-1][:]

    x = x_full_ref[:, -dim:]
    mu = out[:, :dim]
    s = jnp.clip(out[:, dim:], clip_lo, clip_hi)
    z_ref[:] = (x - mu) * jnp.exp(-s)
    ld_ref[:] = -jnp.sum(s, axis=-1, keepdims=True)


def _backward_body(
    x_full_ref, *refs, dim, n_layers, clip_lo, clip_hi, bf16
):
    # refs layout: w0..w{L-1}, b0..b{L-1}, g_z, g_ld, dx_full, dw0..dw{L-1}, db0..db{L-1}
    ws = refs[:n_layers]
    bs = refs[n_layers : 2 * n_layers]
    g_z_ref = refs[2 * n_layers]
    g_ld_ref = refs[2 * n_layers + 1]
    dx_ref = refs[2 * n_layers + 2]
    dws = refs[2 * n_layers + 3 : 3 * n_layers + 3]
    dbs = refs[3 * n_layers + 3 :]
    _dot = _make_dot(bf16)

    # recompute forward, keeping activations
    hs = [x_full_ref[:]]
    h = hs[0]
    for k in range(n_layers - 1):
        h = jnp.tanh(_dot_nt(h, ws[k][:], bf16) + bs[k][:])
        hs.append(h)
    out = _dot_nt(h, ws[-1][:], bf16) + bs[-1][:]

    x = x_full_ref[:, -dim:]
    mu = out[:, :dim]
    s_raw = out[:, dim:]
    s = jnp.clip(s_raw, clip_lo, clip_hi)
    e = jnp.exp(-s)
    z = (x - mu) * e

    g_z = g_z_ref[:]
    g_ld = g_ld_ref[:]  # (TB, 1)

    # z = (x - mu) * exp(-s); ld = -sum(s)
    g_mu = -g_z * e
    g_s = -g_z * z - g_ld  # broadcast (TB,1) over dim
    g_s = jnp.where((s_raw > clip_lo) & (s_raw < clip_hi), g_s, 0.0)
    g_out = jnp.concatenate([g_mu, g_s], axis=-1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (*dws, *dbs):
            r[:] = jnp.zeros_like(r)

    # output layer grads (TN contraction: no g.T materialization)
    dws[-1][:] += _dot_tn(g_out, hs[-1], bf16)
    dbs[-1][:] += jnp.sum(g_out, axis=0, keepdims=True)
    g_h = _dot(g_out, ws[-1][:])

    for k in range(n_layers - 2, -1, -1):
        g_pre = g_h * (1.0 - hs[k + 1] * hs[k + 1])
        dws[k][:] += _dot_tn(g_pre, hs[k], bf16)
        dbs[k][:] += jnp.sum(g_pre, axis=0, keepdims=True)
        g_h = _dot(g_pre, ws[k][:])

    # direct dependence of z on x (identity block of x_full)
    direct = g_z * e
    cin = g_h.shape[-1]
    if cin == dim:
        g_h = g_h + direct
    else:
        pad = jnp.zeros(direct.shape[:-1] + (cin - dim,), direct.dtype)
        g_h = g_h + jnp.concatenate([pad, direct], axis=-1)
    dx_ref[:] = g_h


def _pad_batch(a, tile):
    b = a.shape[0]
    pad = (-b) % tile
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, b


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def fused_made_affine_layer(
    x_full,
    weights,
    biases,
    dim: int,
    clip_lo: float = -5.0,
    clip_hi: float = 3.0,
    tile: int = 512,
    interpret: bool = False,
    bf16: bool = True,
):
    """Fused conditioner + affine update.

    Args:
      x_full: (B, Cin) concatenated [context, x] (x in the last ``dim``
        columns; pass x itself when unconditional).
      weights: per-MLP-layer pre-masked weights, each (out_k, in_k).
      biases: matching biases (out_k,).
    Returns: (z (B, dim), logdet (B,)) — same math as the jnp path.
    """
    z, ld = _fused_forward(
        x_full, tuple(weights), tuple(biases), dim, clip_lo, clip_hi, tile,
        interpret, bf16,
    )
    return z, ld


def _fused_forward(x_full, weights, biases, dim, clip_lo, clip_hi, tile, interpret, bf16):
    n_layers = len(weights)
    x_pad, b_true = _pad_batch(x_full, tile)
    B = x_pad.shape[0]
    grid = (B // tile,)
    cin = x_pad.shape[1]

    kernel = functools.partial(
        _forward_body, dim=dim, n_layers=n_layers, clip_lo=clip_lo,
        clip_hi=clip_hi, bf16=bf16,
    )
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]
    b_specs = [
        pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for b in biases
    ]
    z, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            *b_specs,
        ],
        out_specs=(
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, dim), x_pad.dtype),
            jax.ShapeDtypeStruct((B, 1), x_pad.dtype),
        ),
        interpret=interpret,
    )(x_pad, *weights, *[b.reshape(1, -1) for b in biases])
    return z[:b_true], ld[:b_true, 0]


def _fwd(x_full, weights, biases, dim, clip_lo, clip_hi, tile, interpret, bf16):
    out = _fused_forward(
        x_full, tuple(weights), tuple(biases), dim, clip_lo, clip_hi, tile,
        interpret, bf16,
    )
    return out, (x_full, tuple(weights), tuple(biases))


def _bwd(dim, clip_lo, clip_hi, tile, interpret, bf16, res, g):
    x_full, weights, biases = res
    g_z, g_ld = g
    n_layers = len(weights)

    x_pad, b_true = _pad_batch(x_full, tile)
    g_z_pad, _ = _pad_batch(g_z, tile)
    g_ld_pad, _ = _pad_batch(g_ld.reshape(-1, 1), tile)
    B = x_pad.shape[0]
    cin = x_pad.shape[1]
    grid = (B // tile,)

    kernel = functools.partial(
        _backward_body, dim=dim, n_layers=n_layers, clip_lo=clip_lo,
        clip_hi=clip_hi, bf16=bf16,
    )
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]
    b_specs = [
        pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for b in biases
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            *b_specs,
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
            *b_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, cin), x_pad.dtype),
            *[jax.ShapeDtypeStruct(w.shape, w.dtype) for w in weights],
            *[jax.ShapeDtypeStruct((1, b.shape[-1]), b.dtype) for b in biases],
        ),
        interpret=interpret,
    )(x_pad, *weights, *[b.reshape(1, -1) for b in biases], g_z_pad, g_ld_pad)

    dx_full = outs[0][:b_true]
    dws = tuple(outs[1 : 1 + n_layers])
    dbs = tuple(o.reshape(-1) for o in outs[1 + n_layers :])
    return dx_full, dws, dbs


fused_made_affine_layer.defvjp(_fwd, _bwd)

"""Masked affine autoregressive flow — stacked-layer, scan-based.

Capability parity with the reference MAF
(``/root/reference/src/naz/flows/bflow_jax_maf.py:107-225`` and
``src/naz/flows/transforms.py:133-160``) with a TPU-first layout:

* all ``n_layers`` MADE layers are **stacked along a leading axis** and the
  flow walks them with ``lax.scan`` — one compiled conditioner trace for the
  whole stack (instead of 16 unrolled layer programs), which XLA pipelines;
* **orientation is explicit**. ``invert=False`` (default) is the classic MAF:
  density evaluation (the MLE/NUTS hot path) is ONE conditioner pass per
  layer; sampling is the sequential ``dim``-pass inversion. ``invert=True``
  reproduces the reference's convention (one-pass sampling, sequential
  density — IAF-like), used for importing reference-trained weights;
* the sequential inversion is a ``fori_loop`` of full-vector updates: after
  pass ``k`` every coordinate of autoregressive degree ``<= k`` is exact, so
  ``dim`` passes converge — same fixed point as the reference's per-coordinate
  loop (``bflow_jax_maf.py:186-190``) but without data-dependent gathers, so
  it stays MXU-shaped under ``vmap`` over chains.

Convention: ``forward(params, x, context)`` maps data -> latent and returns
``(z, log|det dz/dx|)``; ``inverse`` maps latent -> data with its own
log-det. ``log_prob = base.log_prob(forward(x)) + logdet``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import functools

from naz_tpu.ops.masks import made_masks, random_permutations
from naz_tpu.ops.masked_dense import made_mlp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_sequential(flow, params, z, context):
    """Sampling through the fused kernels (inference path); gradients, if
    ever requested, re-derive through the jnp sequential path."""
    return flow._sequential_pallas_impl(params, z, context)


def _pallas_sequential_fwd(flow, params, z, context):
    return flow._sequential_pallas_impl(params, z, context), (params, z, context)


def _pallas_sequential_bwd(flow, res, g):
    params, z, context = res
    _, vjp = jax.vjp(
        lambda p, zz, cc: flow._sequential_jnp(p, zz, cc), params, z, context
    )
    return vjp(g)


_pallas_sequential.defvjp(_pallas_sequential_fwd, _pallas_sequential_bwd)


@dataclasses.dataclass(frozen=True, eq=False)
class MaskedAutoregressiveFlow:
    """Static configuration for a stack of MADE affine layers."""

    dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    n_layers: int
    masks: Tuple[jnp.ndarray, ...]  # each (n_layers, out_k, in_k)
    permutations: jnp.ndarray  # (n_layers, dim) int — recorded for parity/import
    activation: Callable = jnp.tanh
    log_scale_clip: Tuple[float, float] = (-5.0, 3.0)
    invert: bool = False
    dropout_rate: float = 0.0
    # Use the fused Pallas conditioner+affine kernel for the one-pass
    # density direction (TPU; interpret-mode on CPU). Requires tanh
    # activation and no dropout; other paths fall back to jnp.
    use_pallas: bool = False
    # Kernel selection: None = auto by VMEM fit; "stack" = every layer's
    # weights VMEM-resident for the whole grid (one pallas_call for the
    # full flow — small models, e.g. 16x[150]^3); "layer" = one fused
    # kernel per flow layer under lax.scan (weights of ONE layer resident
    # — production 4-param scale 18x[512]^5, where the stack's 75 MB of
    # weights cannot fit the ~16 MB of VMEM). Measured at that shape:
    # 4.77 grad-evals/s vs 4.30 XLA-bf16 / 3.09 XLA-f32 (PERFORMANCE.md).
    pallas_mode: Optional[str] = None
    pallas_tile: int = 1024
    # bf16 MXU passes inside the Pallas kernel (XLA-default precision);
    # set False for bitwise parity with the f32 jnp path
    pallas_bf16: bool = True
    # Matmul-operand dtype for the conditioner chain (None = f32). bf16
    # halves the HBM bytes of the (batch, hidden) activations — the hot
    # path is bandwidth-bound at production scale, so this is ~3x measured
    # (PERFORMANCE.md) — while biases, the affine update, and the log-det
    # stay f32. The density becomes a deterministic bf16-rounded
    # approximation: fine for MLE training and for MCMC *gradients*
    # (leapfrog with any deterministic field is volume-preserving and
    # reversible; use the f32 potential for accept energies — see
    # naz_tpu.mcmc.chees mixed-precision support).
    compute_dtype: Optional[str] = None
    # Rematerialize per-layer activations in the backward pass: the scan
    # body is wrapped in jax.checkpoint, so backward recomputes each
    # layer's conditioner instead of storing (n_layers, batch, hidden)
    # residuals. At the reference's full workload (16 layers x 190k points
    # x [150]^3, 4 chains) stored residuals exceed 40 GB — far past HBM —
    # while remat keeps only the (batch, dim) carries. ~17% extra FLOPs.
    remat: bool = True
    # lax.scan unroll factor for the layer walk. The per-op profile
    # (PERF_PROFILE.json, PERFORMANCE.md "closing the roofline account")
    # shows the production grad eval spends ~4-6 ms/iter in while-loop
    # bookkeeping around the scanned backward: async copies of
    # (batch, hidden) activation/cotangent buffers at iteration
    # boundaries and dynamic-update-slice fusions accumulating per-layer
    # weight grads into the stacked (L, out, in) buffers. Unrolling the
    # scan turns the layer index static so those become plain dataflow
    # XLA can fuse. Costs compile time (body duplicated unroll times);
    # set to n_layers for full unroll on small-depth production shapes.
    scan_unroll: int = 1

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(
        dim: int,
        n_layers: int,
        hidden_dims: Sequence[int],
        context_dim: int = 0,
        *,
        seed: int = 0,
        permutations: Optional[np.ndarray] = None,
        activation: Callable = jnp.tanh,
        log_scale_clip: Tuple[float, float] = (-5.0, 3.0),
        invert: bool = False,
        dropout_rate: float = 0.0,
        use_pallas: bool = False,
        pallas_mode: Optional[str] = None,
        pallas_tile: int = 1024,
        pallas_bf16: bool = True,
        compute_dtype: Optional[str] = None,
        remat: bool = True,
        simple_masking: bool = True,
        scan_unroll: int = 1,
    ) -> "MaskedAutoregressiveFlow":
        rng = np.random.default_rng(seed)
        if permutations is None:
            permutations = random_permutations(rng, dim, n_layers)
        permutations = np.asarray(permutations)
        per_layer = [
            made_masks(
                dim, context_dim, hidden_dims, permutations[l], n_params=2,
                simple_masking=simple_masking, rng=rng,
            )[0]
            for l in range(n_layers)
        ]
        stacked = tuple(
            jnp.stack([per_layer[l][k] for l in range(n_layers)])
            for k in range(len(hidden_dims) + 1)
        )
        return MaskedAutoregressiveFlow(
            dim=dim,
            context_dim=context_dim,
            hidden_dims=tuple(hidden_dims),
            n_layers=n_layers,
            masks=stacked,
            permutations=jnp.asarray(permutations),
            activation=activation,
            log_scale_clip=log_scale_clip,
            invert=invert,
            dropout_rate=dropout_rate,
            use_pallas=use_pallas,
            pallas_mode=pallas_mode,
            pallas_tile=pallas_tile,
            pallas_bf16=pallas_bf16,
            compute_dtype=compute_dtype,
            remat=remat,
            scan_unroll=scan_unroll,
        )

    def init_params(self, key, scale: float = 1e-2):
        """Near-identity init: scaled-normal hidden layers, zero final layer.

        With a zero final layer the flow starts as the identity map (mean 0,
        log-scale 0) — strictly better conditioned than the reference's
        ``1e-5``-scaled final layer (``bflow_jax_maf.py:273``).
        """
        cin = self.context_dim + self.dim
        widths = [cin, *self.hidden_dims, self.n_param_blocks * self.dim]
        params = []
        keys = jax.random.split(key, len(widths) - 1)
        for k, (fan_in, fan_out) in zip(keys, zip(widths[:-1], widths[1:])):
            last = fan_out == widths[-1] and len(params) == len(widths) - 2
            if last:
                w = jnp.zeros((self.n_layers, fan_out, fan_in))
            else:
                w = scale * jax.random.normal(
                    k, (self.n_layers, fan_out, fan_in)
                ) / np.sqrt(fan_in)
            params.append({"w": w, "b": jnp.zeros((self.n_layers, fan_out))})
        return tuple(params)

    # -- conditioner & elementwise map (overridden by spline variants) ----

    # number of conditioner output blocks per feature (affine: mu, log_s)
    @property
    def n_param_blocks(self) -> int:
        return 2

    def _conditioner(self, x, layer_params, layer_masks, context, dropout_key=None):
        return made_mlp(
            x,
            layer_params,
            layer_masks,
            context=context,
            activation=self.activation,
            n_params=self.n_param_blocks,
            dropout_rate=self.dropout_rate,
            dropout_key=dropout_key,
            compute_dtype=jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else None,
        )

    def _elem_fwd(self, x, blocks):
        """Elementwise map x -> z given conditioner blocks; (z, sum logdet)."""
        mu, log_s = blocks
        log_s = jnp.clip(log_s, *self.log_scale_clip)
        return (x - mu) * jnp.exp(-log_s), -jnp.sum(log_s, axis=-1)

    def _elem_inv(self, z, blocks):
        """Elementwise map z -> x given conditioner blocks; (x, sum logdet)."""
        mu, log_s = blocks
        log_s = jnp.clip(log_s, *self.log_scale_clip)
        return mu + z * jnp.exp(log_s), jnp.sum(log_s, axis=-1)

    # -- primitive directions (ignore `invert`) ----------------------------

    def _maybe_remat(self, body):
        return jax.checkpoint(body) if self.remat else body

    def _layer_scan(self, body, init, xs, reverse=False):
        """The layer walk: a (possibly unrolled, possibly remat'd) scan."""
        return lax.scan(
            self._maybe_remat(body), init, xs, reverse=reverse,
            unroll=min(self.scan_unroll, self.n_layers),
        )

    def _layer_keys(self, dropout_key):
        """Per-flow-layer dropout keys as scan xs (None -> no dropout)."""
        if dropout_key is None or self.dropout_rate == 0.0:
            return None
        return jax.vmap(lambda i: jax.random.fold_in(dropout_key, i))(
            jnp.arange(self.n_layers)
        )

    def _one_pass(self, params, x, context, dropout_key=None):
        """data -> latent in one conditioner pass per layer (fast density)."""
        if (
            self.use_pallas
            and dropout_key is None
            and self.activation is jnp.tanh
            and self.compute_dtype is None
            and type(self) is MaskedAutoregressiveFlow
        ):
            return self._one_pass_pallas(params, x, context)
        keys = self._layer_keys(dropout_key)

        def body(carry, xs):
            x, ld = carry
            layer_params, layer_masks, k = xs
            blocks = self._conditioner(x, layer_params, layer_masks, context, k)
            z, d = self._elem_fwd(x, blocks)
            return (z, ld + d), None

        init = (x, jnp.zeros(x.shape[:-1], dtype=x.dtype))
        (z, ld), _ = self._layer_scan(body, init, (params, self.masks, keys))
        return z, ld

    # -- Pallas kernel selection -------------------------------------------

    def _weight_bytes_per_layer(self) -> int:
        cin = self.context_dim + self.dim
        widths = [cin, *self.hidden_dims, self.n_param_blocks * self.dim]
        return 4 * sum(a * b for a, b in zip(widths[:-1], widths[1:]))

    def _pallas_plan(self) -> Tuple[str, int]:
        """(mode, tile): ``"stack"`` when every layer's weights fit in VMEM
        together, else ``"layer"`` with a tile sized so the flash-style
        backward (activations + weight-grad accumulators + one layer's
        weights twice) stays under the ~16 MB/core VMEM budget."""
        vmem = 16 * 1024 * 1024
        w_layer = self._weight_bytes_per_layer()
        if self.pallas_mode == "stack" or (
            self.pallas_mode is None and self.n_layers * w_layer <= vmem // 2
        ):
            return "stack", self.pallas_tile
        maxw = max(self.hidden_dims)
        tile = self.pallas_tile
        # backward VMEM estimate: stored activations ((n_hidden)x(tile,maxw))
        # + g_h/g_pre working pairs + weights and their grad accumulators
        while tile > 128:
            acts = (len(self.hidden_dims) + 2) * tile * maxw * 4
            if acts + 2 * w_layer <= vmem and tile <= 1024:
                break
            tile //= 2
        return "layer", tile

    def _one_pass_pallas(self, params, x, context):
        """Fused conditioner+affine Pallas kernels for the density pass.

        Two shapes of the same idea (``naz_tpu/ops/pallas/made_stack.py``
        has the bandwidth argument): the whole-stack kernel walks ALL
        layers for a VMEM-resident batch tile in one ``pallas_call``; the
        per-layer kernel (``made_fused.py``) scans layers, keeping one
        layer's weights resident — required once the stacked weights
        outgrow VMEM (4-param production shape 18x[512]^5 = 75 MB)."""
        interpret = jax.default_backend() == "cpu"
        lo, hi = self.log_scale_clip
        batch_shape = x.shape[:-1]
        x2 = x.reshape(-1, self.dim)
        ctx2 = (
            context.reshape(-1, context.shape[-1])
            if context is not None
            else jnp.zeros(x2.shape[:-1] + (0,), x2.dtype)
        )
        mode, tile = self._pallas_plan()
        if mode == "stack":
            from naz_tpu.ops.pallas import fused_made_stack

            # pre-masked, in-major weights; biases as (L, 1, out) rows
            ws = tuple(
                jnp.transpose(p["w"] * m, (0, 2, 1))
                for p, m in zip(params, self.masks)
            )
            bs = tuple(p["b"][:, None, :] for p in params)
            z, ld = fused_made_stack(
                x2, ctx2, ws, bs, self.dim, lo, hi, tile, interpret,
                self.pallas_bf16,
            )
            return z.reshape(batch_shape + (self.dim,)), ld.reshape(batch_shape)

        from naz_tpu.ops.pallas import fused_made_affine_layer

        ws = tuple(p["w"] * m for p, m in zip(params, self.masks))
        bs = tuple(p["b"] for p in params)

        def body(carry, xs):
            xc, ld = carry
            wl, bl = xs
            x_full = jnp.concatenate([ctx2, xc], axis=-1) if ctx2.shape[-1] else xc
            z, d = fused_made_affine_layer(
                x_full, tuple(wl), tuple(bl), self.dim, lo, hi, tile,
                interpret, self.pallas_bf16,
            )
            return (z, ld + d), None

        (z, ld), _ = lax.scan(
            body, (x2, jnp.zeros(x2.shape[0], x2.dtype)), (ws, bs),
            unroll=min(self.scan_unroll, self.n_layers),
        )
        return z.reshape(batch_shape + (self.dim,)), ld.reshape(batch_shape)

    def _sequential(self, params, z, context, dropout_key=None):
        """latent -> data via dim full-vector passes per layer: solve
        elem_fwd(x, cond(x)) = z by fixed-point iteration in degree order."""
        if (
            self.use_pallas
            and dropout_key is None
            and self.activation is jnp.tanh
            and self.compute_dtype is None
            and type(self) is MaskedAutoregressiveFlow
            # measured (PERFORMANCE.md): the fused sampler ties XLA at
            # MXU-aligned widths ("layer" plan) and trails it 2.4x at the
            # small 150-wide stack shape, so only the layer plan routes
            # through Pallas (keeps the whole big-model path in-kernel,
            # regresses nothing)
            and (self.pallas_mode == "stack" or self._pallas_plan()[0] == "layer")
        ):
            return _pallas_sequential(self, params, z, context)
        return self._sequential_jnp(params, z, context, dropout_key)

    def _sequential_jnp(self, params, z, context, dropout_key=None):
        keys = self._layer_keys(dropout_key)

        def body(carry, xs):
            z, ld = carry
            layer_params, layer_masks, k = xs

            def solve(x):
                blocks = self._conditioner(x, layer_params, layer_masks, context, k)
                return self._elem_inv(z, blocks)

            x = lax.fori_loop(
                0, self.dim - 1, lambda _, x: solve(x)[0], jnp.zeros_like(z)
            )
            x, d = solve(x)
            return (x, ld + d), None

        init = (z, jnp.zeros(z.shape[:-1], dtype=z.dtype))
        (x, ld), _ = self._layer_scan(body, init, (params, self.masks, keys), reverse=True)
        return x, ld

    def _sequential_pallas_impl(self, params, z, context):
        """Fused sampling kernels: the whole ``dim``-pass fixed-point
        inversion runs VMEM-resident (``ops/pallas/made_sample.py``) —
        the PPD-generation hot path (10^6 samples/draw in the reference's
        calibration study, ``calibrate.py:145-150``)."""
        interpret = jax.default_backend() == "cpu"
        lo, hi = self.log_scale_clip
        batch_shape = z.shape[:-1]
        z2 = z.reshape(-1, self.dim)
        ctx2 = (
            context.reshape(-1, context.shape[-1])
            if context is not None
            else jnp.zeros(z2.shape[:-1] + (0,), z2.dtype)
        )
        mode, tile = self._pallas_plan()
        # pre-masked, in-major weights; biases as (L, 1, out) rows
        ws = tuple(
            jnp.transpose(p["w"] * m, (0, 2, 1))
            for p, m in zip(params, self.masks)
        )
        bs = tuple(p["b"][:, None, :] for p in params)
        if mode == "stack":
            from naz_tpu.ops.pallas import fused_made_sample_stack

            x, ld = fused_made_sample_stack(
                z2, ctx2, ws, bs, self.dim, lo, hi, tile, interpret,
                self.pallas_bf16,
            )
        else:
            from naz_tpu.ops.pallas import fused_made_sample_layer

            def body(carry, xs):
                xc, ld = carry
                wl, bl = xs
                x, s_sum = fused_made_sample_layer(
                    xc, ctx2, tuple(wl), tuple(bl), self.dim, lo, hi, tile,
                    interpret, self.pallas_bf16,
                )
                return (x, ld + s_sum), None

            (x, ld), _ = lax.scan(
                body, (z2, jnp.zeros(z2.shape[0], z2.dtype)), (ws, bs),
                reverse=True, unroll=min(self.scan_unroll, self.n_layers),
            )
        return x.reshape(batch_shape + (self.dim,)), ld.reshape(batch_shape)

    # -- public API (honors `invert`) --------------------------------------

    def forward(self, params, x, context=None, dropout_key=None):
        """data -> latent, returns (z, log|det dz/dx|)."""
        context = self._prep_context(x, context)
        if self.invert:
            # Reference orientation: density goes through the sequential
            # direction; its per-layer map is x -> z with x = mu(z..)+...,
            # i.e. we must *solve* the one-pass map. Scan layers in reverse.
            z, ld = self._sequential_as_forward(params, x, context, dropout_key)
            return z, ld
        return self._one_pass(params, x, context, dropout_key)

    def inverse(self, params, z, context=None, dropout_key=None):
        """latent -> data, returns (x, log|det dx/dz|)."""
        context = self._prep_context(z, context)
        if self.invert:
            return self._one_pass_as_inverse(params, z, context, dropout_key)
        return self._sequential(params, z, context, dropout_key)

    # The invert=True direction pair: the underlying per-layer map is
    # y = mu(x_prev) + x * exp(s(x_prev)) applied z->x when SAMPLING (one
    # pass, layer order 0..L-1), exactly `bflow_jax_maf.py:173-179`; density
    # solves it back layer L-1..0, `bflow_jax_maf.py:181-193`.

    def _sequential_as_forward(self, params, y, context, dropout_key=None):
        keys = self._layer_keys(dropout_key)

        def body(carry, xs):
            y, ld = carry
            layer_params, layer_masks, k = xs

            def solve(x):
                blocks = self._conditioner(x, layer_params, layer_masks, context, k)
                return self._elem_fwd(y, blocks)

            x = lax.fori_loop(
                0, self.dim - 1, lambda _, x: solve(x)[0], jnp.zeros_like(y)
            )
            x, d = solve(x)
            return (x, ld + d), None

        init = (y, jnp.zeros(y.shape[:-1], dtype=y.dtype))
        (x, ld), _ = self._layer_scan(body, init, (params, self.masks, keys), reverse=True)
        return x, ld

    def _one_pass_as_inverse(self, params, z, context, dropout_key=None):
        keys = self._layer_keys(dropout_key)

        def body(carry, xs):
            x, ld = carry
            layer_params, layer_masks, k = xs
            blocks = self._conditioner(x, layer_params, layer_masks, context, k)
            y, d = self._elem_inv(x, blocks)
            return (y, ld + d), None

        init = (z, jnp.zeros(z.shape[:-1], dtype=z.dtype))
        (y, ld), _ = self._layer_scan(body, init, (params, self.masks, keys))
        return y, ld

    def _prep_context(self, x, context):
        if x.shape[-1] != self.dim:
            raise ValueError(
                f"expected feature dimension {self.dim}, got input shape {x.shape}"
            )
        if context is None:
            if self.context_dim:
                raise ValueError("flow is conditional: context required")
            return None
        if not self.context_dim:
            raise ValueError("flow is unconditional but a context was passed")
        context = jnp.asarray(context)
        if context.shape[-1] != self.context_dim:
            raise ValueError(
                f"expected context dimension {self.context_dim}, got shape {context.shape}"
            )
        return jnp.broadcast_to(context, x.shape[:-1] + (context.shape[-1],))

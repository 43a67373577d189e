"""Neural-spline flows: autoregressive and coupling variants.

Capability parity with the reference factories
``neural_spline_autoregressive`` (``/root/reference/src/naz/flows/
transforms.py:165-198``, pyro ``SplineAutoregressive``) and
``neural_spline_coupling`` (``transforms.py:201-236`` — broken as written:
undefined ``input_dim``/``paramdim``, typo'd kwargs; this module implements
the intended RealNVP-style behavior).

* :class:`SplineAutoregressiveFlow` subclasses the stacked MAF engine —
  same MADE masks, scan-over-layers, one-pass density / sequential-solve
  sampling — swapping the elementwise affine map for a monotone
  rational-quadratic spline (``naz_tpu.ops.rqs``). The sequential inversion
  converges in ``dim`` fixed-point passes by the same degree argument
  (spline params for coordinate i depend only on lower-degree coords).
* :class:`SplineCoupling` transforms the upper split elementwise with
  splines conditioned on the lower split (+ context) through a plain MLP;
  both directions are single-pass. Layers alternate which half is
  transformed via per-layer feature rolls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from naz_tpu.flows.maf import MaskedAutoregressiveFlow
from naz_tpu.ops.masks import made_masks, random_permutations
from naz_tpu.ops.lrs import lrs_forward, lrs_inverse, prepare_lrs_params
from naz_tpu.ops.rqs import prepare_rqs_params, rqs_forward, rqs_inverse


def _spline_n_params(order: str, count_bins: int) -> int:
    """Conditioner outputs per feature: quadratic 3K-1, linear 4K-1.

    Matches the reference's ``param_dims`` selection by ``order``
    (``transforms.py:180-189``; linear adds K middle-point lambdas)."""
    if order == "quadratic":
        return 3 * count_bins - 1
    if order == "linear":
        return 4 * count_bins - 1
    raise ValueError(f"unknown spline order {order!r}: use 'quadratic' or 'linear'")


@dataclasses.dataclass(frozen=True, eq=False)
class SplineAutoregressiveFlow(MaskedAutoregressiveFlow):
    """Stacked MADE layers with monotone-spline elementwise maps.

    ``order="quadratic"`` (default) uses rational-quadratic splines (Durkan
    et al.), ``order="linear"`` linear-rational splines (Dolatabadi et al.)
    — the two orders exposed by the reference factory
    (``transforms.py:165-198``)."""

    count_bins: int = 8
    bound: float = 5.0
    order: str = "quadratic"

    @property
    def n_param_blocks(self) -> int:
        return _spline_n_params(self.order, self.count_bins)

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
        count_bins: int = 8,
        bound: float = 5.0,
        order: str = "quadratic",
        invert: bool = False,
        dropout_rate: float = 0.0,
    ) -> "SplineAutoregressiveFlow":
        n_params = _spline_n_params(order, count_bins)
        if permutations is None:
            permutations = random_permutations(np.random.default_rng(seed), dim, n_layers)
        permutations = np.asarray(permutations)
        per_layer = [
            made_masks(dim, context_dim, hidden_dims, permutations[l], n_params=n_params)[0]
            for l in range(n_layers)
        ]
        stacked = tuple(
            jnp.stack([per_layer[l][k] for l in range(n_layers)])
            for k in range(len(hidden_dims) + 1)
        )
        return SplineAutoregressiveFlow(
            dim=dim,
            context_dim=context_dim,
            hidden_dims=tuple(hidden_dims),
            n_layers=n_layers,
            masks=stacked,
            permutations=jnp.asarray(permutations),
            activation=activation,
            invert=invert,
            dropout_rate=dropout_rate,
            count_bins=count_bins,
            bound=bound,
            order=order,
        )

    def _knots(self, blocks):
        raw = jnp.stack(blocks, axis=-1)  # (..., dim, n_param_blocks)
        if self.order == "linear":
            return prepare_lrs_params(raw, self.count_bins, self.bound)
        return prepare_rqs_params(raw, self.count_bins, self.bound)

    def _elem_fwd(self, x, blocks):
        if self.order == "linear":
            z, ld = lrs_forward(x, *self._knots(blocks), self.bound)
        else:
            z, ld = rqs_forward(x, *self._knots(blocks), self.bound)
        return z, jnp.sum(ld, axis=-1)

    def _elem_inv(self, z, blocks):
        if self.order == "linear":
            x, ld = lrs_inverse(z, *self._knots(blocks), self.bound)
        else:
            x, ld = rqs_inverse(z, *self._knots(blocks), self.bound)
        return x, jnp.sum(ld, axis=-1)


@dataclasses.dataclass(frozen=True, eq=False)
class SplineCoupling:
    """Stack of RealNVP-style spline coupling layers.

    Per layer: features are rolled by a per-layer offset, split at
    ``split_dim``; the first part passes through unchanged and conditions
    (with the optional context) an MLP that emits spline parameters for the
    second part. Forward and inverse are both one conditioner pass.
    """

    dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    n_layers: int
    split_dim: int
    count_bins: int = 8
    bound: float = 5.0
    order: str = "quadratic"
    activation: Callable = jnp.tanh
    dropout_rate: float = 0.0
    remat: bool = True

    @staticmethod
    def create(
        dim: int,
        n_layers: int,
        hidden_dims: Sequence[int],
        context_dim: int = 0,
        *,
        split_dim: Optional[int] = None,
        count_bins: int = 8,
        bound: float = 5.0,
        order: str = "quadratic",
        activation: Callable = jnp.tanh,
        dropout_rate: float = 0.0,
        seed: int = 0,
    ) -> "SplineCoupling":
        if dim < 2:
            raise ValueError("coupling flows need dim >= 2")
        if split_dim is None:
            split_dim = dim // 2
        _spline_n_params(order, count_bins)  # validate
        return SplineCoupling(
            dim=dim,
            context_dim=context_dim,
            hidden_dims=tuple(hidden_dims),
            n_layers=n_layers,
            split_dim=split_dim,
            count_bins=count_bins,
            bound=bound,
            order=order,
            activation=activation,
            dropout_rate=dropout_rate,
        )

    @property
    def _n_upper(self) -> int:
        return self.dim - self.split_dim

    @property
    def _n_out(self) -> int:
        return self._n_upper * _spline_n_params(self.order, self.count_bins)

    def init_params(self, key):
        cin = self.split_dim + self.context_dim
        widths = [cin, *self.hidden_dims, self._n_out]
        keys = jax.random.split(key, len(widths) - 1)
        params = []
        for i, (k, (fi, fo)) in enumerate(zip(keys, zip(widths[:-1], widths[1:]))):
            last = i == len(widths) - 2
            w = (
                jnp.zeros((self.n_layers, fo, fi))
                if last
                else 1e-2
                * jax.random.normal(k, (self.n_layers, fo, fi))
                / np.sqrt(fi)
            )
            params.append({"w": w, "b": jnp.zeros((self.n_layers, fo))})
        return tuple(params)

    def _cond_mlp(self, h, layer_params, dropout_key):
        for i, layer in enumerate(layer_params[:-1]):
            h = self.activation(
                jnp.dot(h, layer["w"].T, preferred_element_type=jnp.float32)
                + layer["b"]
            )
            if self.dropout_rate > 0.0 and dropout_key is not None:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, i), 1.0 - self.dropout_rate, h.shape
                )
                h = jnp.where(keep, h / (1.0 - self.dropout_rate), 0.0)
        last = layer_params[-1]
        return jnp.dot(h, last["w"].T, preferred_element_type=jnp.float32) + last["b"]

    def _layer(self, x, layer_params, context, dropout_key, inverse: bool):
        # roll is applied outside; here x is already arranged
        lower, upper = x[..., : self.split_dim], x[..., self.split_dim :]
        h = lower if context is None else jnp.concatenate([context, lower], axis=-1)
        raw = self._cond_mlp(h, layer_params, dropout_key)
        raw = raw.reshape(
            raw.shape[:-1]
            + (self._n_upper, _spline_n_params(self.order, self.count_bins))
        )
        if self.order == "linear":
            knots = prepare_lrs_params(raw, self.count_bins, self.bound)
            fn = lrs_inverse if inverse else lrs_forward
        else:
            knots = prepare_rqs_params(raw, self.count_bins, self.bound)
            fn = rqs_inverse if inverse else rqs_forward
        new_upper, ld = fn(upper, *knots, self.bound)
        y = jnp.concatenate([lower, new_upper], axis=-1)
        return y, jnp.sum(ld, axis=-1)

    def _keys(self, dropout_key):
        if dropout_key is None or self.dropout_rate == 0.0:
            return None
        return jax.vmap(lambda i: jax.random.fold_in(dropout_key, i))(
            jnp.arange(self.n_layers)
        )

    def _prep_context(self, x, context):
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

    def forward(self, params, x, context=None, dropout_key=None):
        context = self._prep_context(x, context)
        keys = self._keys(dropout_key)

        def body(carry, xs):
            x, ld = carry
            layer_params, k = xs
            x = jnp.roll(x, 1, axis=-1)  # rotate which features condition
            y, d = self._layer(x, layer_params, context, k, inverse=False)
            return (y, ld + d), None

        if self.remat:
            body = jax.checkpoint(body)
        init = (x, jnp.zeros(x.shape[:-1], dtype=x.dtype))
        (z, ld), _ = lax.scan(body, init, (params, keys))
        return z, ld

    def inverse(self, params, z, context=None, dropout_key=None):
        context = self._prep_context(z, context)
        keys = self._keys(dropout_key)

        def body(carry, xs):
            z, ld = carry
            layer_params, k = xs
            x, d = self._layer(z, layer_params, context, k, inverse=True)
            x = jnp.roll(x, -1, axis=-1)
            return (x, ld + d), None

        if self.remat:
            body = jax.checkpoint(body)
        init = (z, jnp.zeros(z.shape[:-1], dtype=z.dtype))
        (x, ld), _ = lax.scan(body, init, (params, keys), reverse=True)
        return x, ld

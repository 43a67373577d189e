"""Conditioning embedding networks.

Capability parity with ``/root/reference/src/naz/neural_nets/
fully_connected.py``: ``FCEmbeddingNet`` (:class:`MLPEmbedding`),
``ResidualBlock``/``FullyConnectedResNet`` (:class:`ResNetEmbedding`),
``TwoStageEmbeddingNet`` with its SVD-initialized first stage
(:class:`SVDInitEmbedding`, ref ``fully_connected.py:66-83``), and
``Module_merger`` (:class:`ConcatEmbedding`; the reference class is
unusable due to a class-name typo, ``fully_connected.py:107-116``).

All are functional: ``init_params(key) -> pytree``, ``apply(params, x)``.
They plug into ``Flow(embedding=...)`` which applies them to the raw
conditioning variable before the transforms see it (ref ``flow.py:76``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _dense_init(key, fan_in, fan_out, scale=1.0):
    w = scale * jax.random.normal(key, (fan_out, fan_in)) / np.sqrt(fan_in)
    return {"w": w, "b": jnp.zeros(fan_out)}


def _dense(params, x):
    return jnp.dot(x, params["w"].T, preferred_element_type=jnp.float32) + params["b"]


@dataclasses.dataclass(frozen=True, eq=False)
class MLPEmbedding:
    in_dim: int
    out_dim: int
    hidden_dims: Tuple[int, ...] = (64,)
    activation: Callable = jax.nn.relu

    def init_params(self, key):
        widths = [self.in_dim, *self.hidden_dims, self.out_dim]
        keys = jax.random.split(key, len(widths) - 1)
        return tuple(
            _dense_init(k, fi, fo)
            for k, (fi, fo) in zip(keys, zip(widths[:-1], widths[1:]))
        )

    def apply(self, params, x):
        h = x
        for p in params[:-1]:
            h = self.activation(_dense(p, h))
        return _dense(params[-1], h)


@dataclasses.dataclass(frozen=True, eq=False)
class ResNetEmbedding:
    """Input projection -> residual MLP blocks -> output projection,
    matching ``FullyConnectedResNet`` (``fully_connected.py:43-64``)."""

    in_dim: int
    out_dim: int
    width: int = 64
    n_blocks: int = 2
    activation: Callable = jax.nn.relu

    def init_params(self, key):
        keys = jax.random.split(key, 2 * self.n_blocks + 2)
        params = {
            "in": _dense_init(keys[0], self.in_dim, self.width),
            "out": _dense_init(keys[1], self.width, self.out_dim),
            "blocks": tuple(
                (
                    _dense_init(keys[2 + 2 * i], self.width, self.width),
                    _dense_init(keys[3 + 2 * i], self.width, self.width, scale=0.1),
                )
                for i in range(self.n_blocks)
            ),
        }
        return params

    def apply(self, params, x):
        h = self.activation(_dense(params["in"], x))
        for p1, p2 in params["blocks"]:
            r = self.activation(_dense(p1, h))
            h = h + _dense(p2, r)
            h = self.activation(h)
        return _dense(params["out"], h)


@dataclasses.dataclass(frozen=True, eq=False)
class SVDInitEmbedding:
    """Two-stage embedding whose first (linear) stage is initialized with
    the top right-singular vectors of the training conditions — the
    reference's ``TwoStageEmbeddingNet`` (``fully_connected.py:66-83``).
    Build with :meth:`from_data`.
    """

    in_dim: int
    out_dim: int
    rank: int
    v_init: jnp.ndarray  # (rank, in_dim)
    hidden_dims: Tuple[int, ...] = (64,)
    activation: Callable = jax.nn.relu
    trainable_first: bool = True

    @staticmethod
    def from_data(
        data,
        out_dim: int,
        rank: Optional[int] = None,
        hidden_dims: Sequence[int] = (64,),
        activation: Callable = jax.nn.relu,
        trainable_first: bool = True,
    ) -> "SVDInitEmbedding":
        data = np.asarray(data)
        data = data - data.mean(axis=0, keepdims=True)
        _, _, vt = np.linalg.svd(data, full_matrices=False)
        if rank is None:
            rank = min(out_dim, vt.shape[0])
        return SVDInitEmbedding(
            in_dim=data.shape[1],
            out_dim=out_dim,
            rank=rank,
            v_init=jnp.asarray(vt[:rank]),
            hidden_dims=tuple(hidden_dims),
            activation=activation,
            trainable_first=trainable_first,
        )

    def init_params(self, key):
        second = MLPEmbedding(self.rank, self.out_dim, self.hidden_dims, self.activation)
        params = {"second": second.init_params(key)}
        if self.trainable_first:
            params["first"] = {"w": self.v_init, "b": jnp.zeros(self.rank)}
        return params

    def apply(self, params, x):
        first = params.get("first", {"w": self.v_init, "b": jnp.zeros(self.rank)})
        h = _dense(first, x)
        second = MLPEmbedding(self.rank, self.out_dim, self.hidden_dims, self.activation)
        return second.apply(params["second"], h)


@dataclasses.dataclass(frozen=True, eq=False)
class ConcatEmbedding:
    """Apply one embedding per input slice and concatenate the outputs
    (the intent of the reference's ``Module_merger``)."""

    embeddings: Tuple[object, ...]
    slices: Tuple[Tuple[int, int], ...]  # (start, end) per embedding

    def init_params(self, key):
        keys = jax.random.split(key, len(self.embeddings))
        return tuple(e.init_params(k) for e, k in zip(self.embeddings, keys))

    def apply(self, params, x):
        outs = [
            e.apply(p, x[..., s:t])
            for e, p, (s, t) in zip(self.embeddings, params, self.slices)
        ]
        return jnp.concatenate(outs, axis=-1)

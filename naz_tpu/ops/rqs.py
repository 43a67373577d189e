"""Monotonic rational-quadratic splines (Durkan et al. 2019, NSF).

The elementwise map behind the reference's neural-spline flows
(``/root/reference/src/naz/flows/transforms.py:165-236`` delegates to pyro's
``SplineAutoregressive``/``SplineCoupling``, which implement the same
construction). ``K`` bins on ``[-bound, bound]``, identity linear tails
outside, strictly monotone by construction.

Everything is elementwise and branch-free (``searchsorted`` + gathers on the
VPU), so it vmaps/shards like any other pointwise op; forward and inverse
both cost one bin lookup plus a handful of FMA/divides — the inverse solves
the per-bin quadratic in closed form, no iteration.

Raw parameter preprocessing matches the standard recipe: softmax bin
widths/heights (floored at ``min_bin``), softplus interior knot derivatives
(edge derivatives pinned to 1 so the spline meets the identity tails
smoothly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN = 1e-3
DEFAULT_MIN_DERIV = 1e-3


def prepare_rqs_params(
    raw: jnp.ndarray,
    num_bins: int,
    bound: float,
    min_bin: float = DEFAULT_MIN_BIN,
    min_deriv: float = DEFAULT_MIN_DERIV,
):
    """Raw (..., 3K-1) conditioner outputs -> knot positions and derivatives.

    Returns ``(xk, yk, dk)``: x-knots (..., K+1), y-knots (..., K+1),
    derivatives at the knots (..., K+1) with the boundary derivatives fixed
    to 1.
    """
    w_raw = raw[..., :num_bins]
    h_raw = raw[..., num_bins : 2 * num_bins]
    d_raw = raw[..., 2 * num_bins :]

    widths = jax.nn.softmax(w_raw, axis=-1)
    widths = min_bin + (1.0 - min_bin * num_bins) * widths
    heights = jax.nn.softmax(h_raw, axis=-1)
    heights = min_bin + (1.0 - min_bin * num_bins) * heights

    xk = jnp.concatenate(
        [
            jnp.full(raw.shape[:-1] + (1,), -bound, raw.dtype),
            -bound + 2.0 * bound * jnp.cumsum(widths, axis=-1),
        ],
        axis=-1,
    )
    # pin the exact endpoint (cumsum rounding)
    xk = xk.at[..., -1].set(bound)
    yk = jnp.concatenate(
        [
            jnp.full(raw.shape[:-1] + (1,), -bound, raw.dtype),
            -bound + 2.0 * bound * jnp.cumsum(heights, axis=-1),
        ],
        axis=-1,
    )
    yk = yk.at[..., -1].set(bound)

    # shift so zero raw inputs give derivative ~= 1: with uniform bins this
    # makes the zero-initialized spline the identity map on [-bound, bound]
    shift = jnp.log(jnp.expm1(1.0 - min_deriv))
    d_interior = min_deriv + jax.nn.softplus(d_raw + shift)
    ones = jnp.ones(raw.shape[:-1] + (1,), raw.dtype)
    dk = jnp.concatenate([ones, d_interior, ones], axis=-1)
    return xk, yk, dk


def _gather(a, idx):
    return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]


def rqs_forward(x, xk, yk, dk, bound: float):
    """Elementwise spline map; returns (y, log|dy/dx|) with identity tails."""
    inside = (x > -bound) & (x < bound)
    xc = jnp.clip(x, -bound, bound)

    # batched bin lookup: K is small, a comparison-sum beats a search
    k = jnp.clip(
        jnp.sum(xc[..., None] >= xk[..., :-1], axis=-1) - 1, 0, xk.shape[-1] - 2
    )
    x0, x1 = _gather(xk, k), _gather(xk, k + 1)
    y0, y1 = _gather(yk, k), _gather(yk, k + 1)
    d0, d1 = _gather(dk, k), _gather(dk, k + 1)

    w = x1 - x0
    s = (y1 - y0) / w
    xi = (xc - x0) / w

    num = (y1 - y0) * (s * xi * xi + d0 * xi * (1.0 - xi))
    den = s + (d1 + d0 - 2.0 * s) * xi * (1.0 - xi)
    y = y0 + num / den

    deriv_num = s * s * (d1 * xi * xi + 2.0 * s * xi * (1.0 - xi) + d0 * (1.0 - xi) ** 2)
    log_deriv = jnp.log(deriv_num) - 2.0 * jnp.log(den)

    y = jnp.where(inside, y, x)
    log_deriv = jnp.where(inside, log_deriv, 0.0)
    return y, log_deriv


def rqs_inverse(y, xk, yk, dk, bound: float):
    """Closed-form inverse; returns (x, log|dx/dy|)."""
    inside = (y > -bound) & (y < bound)
    yc = jnp.clip(y, -bound, bound)

    k = jnp.clip(
        jnp.sum(yc[..., None] >= yk[..., :-1], axis=-1) - 1, 0, yk.shape[-1] - 2
    )
    x0, x1 = _gather(xk, k), _gather(xk, k + 1)
    y0, y1 = _gather(yk, k), _gather(yk, k + 1)
    d0, d1 = _gather(dk, k), _gather(dk, k + 1)

    w = x1 - x0
    s = (y1 - y0) / w
    t = yc - y0

    # solve a*xi^2 + b*xi + c = 0 for xi in [0,1] (Durkan et al. appendix)
    a = (y1 - y0) * (s - d0) + t * (d1 + d0 - 2.0 * s)
    b = (y1 - y0) * d0 - t * (d1 + d0 - 2.0 * s)
    c = -s * t
    disc = b * b - 4.0 * a * c
    disc = jnp.maximum(disc, 0.0)
    # numerically stable root: xi = 2c / (-b - sqrt(disc))
    xi = 2.0 * c / (-b - jnp.sqrt(disc))
    xi = jnp.clip(xi, 0.0, 1.0)
    x = x0 + w * xi

    den = s + (d1 + d0 - 2.0 * s) * xi * (1.0 - xi)
    deriv_num = s * s * (d1 * xi * xi + 2.0 * s * xi * (1.0 - xi) + d0 * (1.0 - xi) ** 2)
    log_deriv = jnp.log(deriv_num) - 2.0 * jnp.log(den)

    x = jnp.where(inside, x, y)
    log_deriv = jnp.where(inside, -log_deriv, 0.0)
    return x, log_deriv

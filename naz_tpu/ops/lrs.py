"""Monotonic linear-rational splines (Dolatabadi et al. 2020, LRS).

The ``order="linear"`` elementwise map of the reference's neural-spline
factory (``/root/reference/src/naz/flows/transforms.py:180-189`` selects
pyro's linear-rational construction via ``param_dims = [K, K, K-1, K]``).
Same interface and conventions as :mod:`naz_tpu.ops.rqs`: ``K`` bins on
``[-bound, bound]``, identity linear tails, strictly monotone, branch-free
(comparison-sum bin lookup + gathers on the VPU), closed-form inverse.

Construction (derived, not ported): each bin ``[x0, x1] -> [y0, y1]`` with
knot derivatives ``d0, d1`` is split at a learned interior point
``theta = lam`` into two Moebius (linear-rational) pieces

    y(u) = (w_a y_a (1-u) + w_b y_b u) / (w_a (1-u) + w_b u),

glued C^1 at the middle knot ``(lam, ym)``. Solving the three matching
conditions (endpoint derivatives ``d0``, ``d1`` and derivative continuity
at ``lam``) with the gauge ``w_left = 1`` gives

    w_right  = sqrt(d0 / d1)
    w_mid    = (lam * d0 * w_left + (1 - lam) * d1 * w_right) / s,  s = dy/dx
    ym       = y0 + lam * d0 * (x1 - x0) * w_left / w_mid.

Zero raw parameters (uniform bins, unit derivatives, ``lam = 1/2``) give the
identity map, matching the RQS initialization convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from naz_tpu.ops.rqs import DEFAULT_MIN_BIN, DEFAULT_MIN_DERIV, _gather


def prepare_lrs_params(
    raw: jnp.ndarray,
    num_bins: int,
    bound: float,
    min_bin: float = DEFAULT_MIN_BIN,
    min_deriv: float = DEFAULT_MIN_DERIV,
    min_lambda: float = 0.025,
):
    """Raw (..., 4K-1) conditioner outputs -> knots, derivatives, lambdas.

    Returns ``(xk, yk, dk, lam)``: x-knots (..., K+1), y-knots (..., K+1),
    knot derivatives (..., K+1) with boundary derivatives pinned to 1, and
    per-bin middle-point positions ``lam`` (..., K) squashed into
    ``[min_lambda, 1 - min_lambda]``.
    """
    w_raw = raw[..., :num_bins]
    h_raw = raw[..., num_bins : 2 * num_bins]
    d_raw = raw[..., 2 * num_bins : 3 * num_bins - 1]
    l_raw = raw[..., 3 * num_bins - 1 :]

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
    xk = xk.at[..., -1].set(bound)
    yk = jnp.concatenate(
        [
            jnp.full(raw.shape[:-1] + (1,), -bound, raw.dtype),
            -bound + 2.0 * bound * jnp.cumsum(heights, axis=-1),
        ],
        axis=-1,
    )
    yk = yk.at[..., -1].set(bound)

    shift = jnp.log(jnp.expm1(1.0 - min_deriv))
    d_interior = min_deriv + jax.nn.softplus(d_raw + shift)
    ones = jnp.ones(raw.shape[:-1] + (1,), raw.dtype)
    dk = jnp.concatenate([ones, d_interior, ones], axis=-1)

    lam = min_lambda + (1.0 - 2.0 * min_lambda) * jax.nn.sigmoid(l_raw)
    return xk, yk, dk, lam


def _bin_weights(x0, x1, y0, y1, d0, d1, lam):
    """Per-bin Moebius weights and middle knot: (w_r, w_m, ym, s)."""
    w = x1 - x0
    s = (y1 - y0) / w
    w_r = jnp.sqrt(d0 / d1)
    w_m = (lam * d0 + (1.0 - lam) * d1 * w_r) / s
    ym = y0 + lam * d0 * w / w_m
    return w_r, w_m, ym, s


def lrs_forward(x, xk, yk, dk, lam, bound: float):
    """Elementwise LRS map; returns (y, log|dy/dx|) with identity tails."""
    inside = (x > -bound) & (x < bound)
    xc = jnp.clip(x, -bound, bound)

    k = jnp.clip(
        jnp.sum(xc[..., None] >= xk[..., :-1], axis=-1) - 1, 0, xk.shape[-1] - 2
    )
    x0, x1 = _gather(xk, k), _gather(xk, k + 1)
    y0, y1 = _gather(yk, k), _gather(yk, k + 1)
    d0, d1 = _gather(dk, k), _gather(dk, k + 1)
    lm = _gather(lam, k)

    w = x1 - x0
    theta = (xc - x0) / w
    w_r, w_m, ym, _ = _bin_weights(x0, x1, y0, y1, d0, d1, lm)

    left = theta <= lm
    # left piece: endpoints (y0, w=1) -> (ym, w_m), u in [0, 1]
    u = theta / lm
    den_l = (1.0 - u) + w_m * u
    y_l = (y0 * (1.0 - u) + w_m * ym * u) / den_l
    ld_l = jnp.log(w_m) + jnp.log(ym - y0) - 2.0 * jnp.log(den_l) - jnp.log(lm * w)
    # right piece: endpoints (ym, w_m) -> (y1, w_r), v in [0, 1]
    v = (theta - lm) / (1.0 - lm)
    den_r = w_m * (1.0 - v) + w_r * v
    y_r = (w_m * ym * (1.0 - v) + w_r * y1 * v) / den_r
    ld_r = (
        jnp.log(w_m)
        + jnp.log(w_r)
        + jnp.log(y1 - ym)
        - 2.0 * jnp.log(den_r)
        - jnp.log((1.0 - lm) * w)
    )

    y = jnp.where(left, y_l, y_r)
    log_deriv = jnp.where(left, ld_l, ld_r)
    y = jnp.where(inside, y, x)
    log_deriv = jnp.where(inside, log_deriv, 0.0)
    return y, log_deriv


def lrs_inverse(y, xk, yk, dk, lam, bound: float):
    """Closed-form inverse; returns (x, log|dx/dy|)."""
    inside = (y > -bound) & (y < bound)
    yc = jnp.clip(y, -bound, bound)

    k = jnp.clip(
        jnp.sum(yc[..., None] >= yk[..., :-1], axis=-1) - 1, 0, yk.shape[-1] - 2
    )
    x0, x1 = _gather(xk, k), _gather(xk, k + 1)
    y0, y1 = _gather(yk, k), _gather(yk, k + 1)
    d0, d1 = _gather(dk, k), _gather(dk, k + 1)
    lm = _gather(lam, k)

    w = x1 - x0
    w_r, w_m, ym, _ = _bin_weights(x0, x1, y0, y1, d0, d1, lm)

    left = yc <= ym
    # invert the Moebius pieces: u = w_a(y-y_a) / (w_a(y-y_a) + w_b(y_b-y))
    t_l = yc - y0
    u = t_l / (t_l + w_m * jnp.maximum(ym - yc, 0.0))
    u = jnp.clip(u, 0.0, 1.0)
    den_l = (1.0 - u) + w_m * u
    ld_l = jnp.log(w_m) + jnp.log(ym - y0) - 2.0 * jnp.log(den_l) - jnp.log(lm * w)
    theta_l = lm * u

    t_r = w_m * jnp.maximum(yc - ym, 0.0)
    v = t_r / (t_r + w_r * (y1 - yc))
    v = jnp.clip(v, 0.0, 1.0)
    den_r = w_m * (1.0 - v) + w_r * v
    ld_r = (
        jnp.log(w_m)
        + jnp.log(w_r)
        + jnp.log(y1 - ym)
        - 2.0 * jnp.log(den_r)
        - jnp.log((1.0 - lm) * w)
    )
    theta_r = lm + (1.0 - lm) * v

    theta = jnp.where(left, theta_l, theta_r)
    log_deriv = jnp.where(left, ld_l, ld_r)
    x = x0 + w * theta

    x = jnp.where(inside, x, y)
    log_deriv = jnp.where(inside, -log_deriv, 0.0)
    return x, log_deriv

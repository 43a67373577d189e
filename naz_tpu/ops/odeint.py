"""ODE integrators: fixed-step RK4 and adaptive Dormand-Prince 5(4).

The reference integrates its CNFs with torchdyn's dopri5 + adjoint
(``/root/reference/src/naz/flows/continuous_transforms.py:70-139``) and
ships a deprecated handwritten solver stack
(``src/naz/neural_nets/__deprecated__/neural_odes/odeint.py``). diffrax is
not in this image, so we own the integrators:

* ``odeint_rk4``: fixed step count -> static shapes, a single ``lax.scan``
  — the TPU-preferred path (deterministic cost, XLA pipelines the scan);
* ``odeint_dopri5``: adaptive with a PI controller inside a bounded
  ``lax.while_loop`` (vmappable);
* gradients flow by backprop through the solver (discretize-then-optimize);
  the step counts used here make that cheaper and more robust than a
  continuous adjoint on TPU.

``f(t, y) -> dy/dt`` operates on an arbitrary pytree ``y``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def odeint_rk4(f: Callable, y0, t0: float, t1: float, num_steps: int):
    h = (t1 - t0) / num_steps

    def step(carry, i):
        t, y = carry
        k1 = f(t, y)
        k2 = f(t + 0.5 * h, jax.tree.map(lambda y, k: y + 0.5 * h * k, y, k1))
        k3 = f(t + 0.5 * h, jax.tree.map(lambda y, k: y + 0.5 * h * k, y, k2))
        k4 = f(t + h, jax.tree.map(lambda y, k: y + h * k, y, k3))
        y = jax.tree.map(
            lambda y, a, b, c, d: y + (h / 6.0) * (a + 2 * b + 2 * c + d),
            y, k1, k2, k3, k4,
        )
        return (t + h, y), None

    (_, y), _ = lax.scan(step, (jnp.asarray(t0, jnp.float32), y0), jnp.arange(num_steps))
    return y


# Dormand–Prince 5(4) Butcher tableau
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def odeint_dopri5(
    f: Callable,
    y0,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    first_step: float = 0.01,
):
    """Adaptive DP5(4); integrates a flat-array state (use ravel for pytrees)."""
    sign = 1.0 if t1 >= t0 else -1.0
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)

    def stages(t, y, h):
        ks = []
        for i in range(7):
            yi = y
            for j, a in enumerate(_DP_A[i]):
                yi = yi + h * a * ks[j]
            ks.append(f(t + h * _DP_C[i], yi))
        return ks

    def err_norm(y, y_new, err):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    def cond(c):
        t, y, h, done, n = c
        return (~done) & (n < max_steps)

    def body(c):
        t, y, h, done, n = c
        h = sign * jnp.minimum(jnp.abs(h), jnp.abs(t1 - t))
        ks = stages(t, y, h)
        y5 = y + h * sum(b * k for b, k in zip(_DP_B5, ks))
        y4 = y + h * sum(b * k for b, k in zip(_DP_B4, ks))
        e = err_norm(y, y5, y5 - y4)
        accept = e <= 1.0
        t_new = jnp.where(accept, t + h, t)
        y_new = jnp.where(accept, y5, y)
        # PI-ish controller
        factor = jnp.clip(0.9 * (jnp.maximum(e, 1e-10)) ** (-0.2), 0.2, 5.0)
        h_new = h * factor
        done_new = accept & (jnp.abs(t_new - t1) < 1e-7)
        return (t_new, y_new, h_new, done_new, n + 1)

    t, y, h, done, n = lax.while_loop(
        cond, body, (t0, y0, jnp.asarray(sign * first_step, jnp.float32), False, 0)
    )
    return y

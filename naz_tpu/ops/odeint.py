"""ODE integrators: fixed-step Midpoint/RK4, adaptive Bosh3(2)/Dopri5(4),
and a continuous-adjoint wrapper.

The reference integrates its CNFs with torchdyn's dopri5 + adjoint
(``/root/reference/src/naz/flows/continuous_transforms.py:70-139``) and
ships a deprecated handwritten solver stack with the same four solvers and
a custom adjoint ``autograd.Function``
(``src/naz/neural_nets/__deprecated__/neural_odes/odeint.py``). diffrax is
not in this image, so we own the integrators:

* ``odeint_midpoint`` / ``odeint_rk4``: fixed step count -> static shapes,
  a single ``lax.scan`` — the TPU-preferred path (deterministic cost, XLA
  pipelines the scan); gradients flow by backprop through the solver
  (discretize-then-optimize);
* ``odeint_bosh3`` / ``odeint_dopri5``: adaptive embedded RK pairs with a
  step controller inside a bounded ``lax.while_loop`` (vmappable). A
  ``while_loop`` is not reverse-differentiable, so for training wrap them
  in ``odeint_adjoint``;
* ``odeint_adjoint``: continuous adjoint via ``jax.custom_vjp`` — the
  backward pass integrates the augmented adjoint ODE
  ``d[a_y, a_p]/dt = -[a_y^T dF/dy, a_y^T dF/dp]`` with the same solver,
  so memory is O(state) regardless of step count (optimize-then-discretize,
  the reference's training mode).

``f(t, y) -> dy/dt`` operates on an arbitrary pytree ``y`` for the
fixed-step solvers; the adaptive solvers and the adjoint wrapper integrate
flat arrays (ravel pytrees first).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


def odeint_midpoint(f: Callable, y0, t0: float, t1: float, num_steps: int):
    """Fixed-step explicit midpoint (RK2) over a pytree state.

    The step body is rematerialized: backward recomputes each step's stage
    evaluations instead of storing every (batch, hidden) vector-field
    activation for all steps — without this, a full-batch (1.9e5-point)
    CNF gradient wants >140 GB of HBM (measured); with it, only the
    per-step (batch, dim+1) carries persist.
    """
    h = (t1 - t0) / num_steps

    @jax.checkpoint
    def step(carry, _):
        t, y = carry
        k1 = f(t, y)
        k2 = f(t + 0.5 * h, jax.tree.map(lambda y, k: y + 0.5 * h * k, y, k1))
        y = jax.tree.map(lambda y, k: y + h * k, y, k2)
        return (t + h, y), None

    (_, y), _ = lax.scan(step, (jnp.asarray(t0, jnp.float32), y0), None, length=num_steps)
    return y


def odeint_rk4(f: Callable, y0, t0: float, t1: float, num_steps: int):
    """Fixed-step classic RK4 over a pytree state (rematerialized step —
    see ``odeint_midpoint``)."""
    h = (t1 - t0) / num_steps

    @jax.checkpoint
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


# Embedded Runge-Kutta tableaus -------------------------------------------

# Bogacki–Shampine 3(2) ("Bosha3" in the deprecated reference stack)
_BS_C = (0.0, 1 / 2, 3 / 4, 1.0)
_BS_A = (
    (),
    (1 / 2,),
    (0.0, 3 / 4),
    (2 / 9, 1 / 3, 4 / 9),
)
_BS_B_HI = (2 / 9, 1 / 3, 4 / 9, 0.0)
_BS_B_LO = (7 / 24, 1 / 4, 1 / 3, 1 / 8)
_BS_ORDER = 3

# Dormand–Prince 5(4)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B_HI = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B_LO = (
    5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40
)
_DP_ORDER = 5


def _odeint_adaptive(
    tableau,
    f: Callable,
    y0,
    t0: float,
    t1: float,
    rtol: float,
    atol: float,
    max_steps: int,
    first_step: float,
):
    """Adaptive embedded-RK core; integrates a flat-array state."""
    c_tab, a_tab, b_hi, b_lo, order = tableau
    sign = 1.0 if t1 >= t0 else -1.0
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)

    def stages(t, y, h):
        ks = []
        for i in range(len(c_tab)):
            yi = y
            for j, a in enumerate(a_tab[i]):
                yi = yi + h * a * ks[j]
            ks.append(f(t + h * c_tab[i], yi))
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
        y_hi = y + h * sum(b * k for b, k in zip(b_hi, ks))
        y_lo = y + h * sum(b * k for b, k in zip(b_lo, ks))
        e = err_norm(y, y_hi, y_hi - y_lo)
        accept = e <= 1.0
        t_new = jnp.where(accept, t + h, t)
        y_new = jnp.where(accept, y_hi, y)
        factor = jnp.clip(
            0.9 * (jnp.maximum(e, 1e-10)) ** (-1.0 / order), 0.2, 5.0
        )
        h_new = h * factor
        done_new = accept & (jnp.abs(t_new - t1) < 1e-7)
        return (t_new, y_new, h_new, done_new, n + 1)

    t, y, h, done, n = lax.while_loop(
        cond, body, (t0, y0, jnp.asarray(sign * first_step, jnp.float32), False, 0)
    )
    return y


def odeint_bosh3(
    f: Callable,
    y0,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    first_step: float = 0.01,
):
    """Adaptive Bogacki–Shampine 3(2); integrates a flat-array state."""
    return _odeint_adaptive(
        (_BS_C, _BS_A, _BS_B_HI, _BS_B_LO, _BS_ORDER),
        f, y0, t0, t1, rtol, atol, max_steps, first_step,
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
    return _odeint_adaptive(
        (_DP_C, _DP_A, _DP_B_HI, _DP_B_LO, _DP_ORDER),
        f, y0, t0, t1, rtol, atol, max_steps, first_step,
    )


# Continuous adjoint --------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def odeint_adjoint(solve: Callable, f: Callable, t0: float, t1: float, params, y0):
    """Differentiable ODE solve with O(state) backward memory.

    ``solve(g, y0, t0, t1)`` is any integrator above (curry tolerances /
    step counts in); ``f(t, y, params) -> dy/dt`` where ``y`` is a flat
    1-D state vector (ravel batches in — one shared adaptive step size per
    solve, as in torchdyn); ``t0``/``t1`` are static Python floats. Reverse
    mode integrates the adjoint ODE backwards with the same solver instead
    of differentiating through the solver loop — so adaptive (while_loop)
    solvers are trainable, matching the reference's dopri5+adjoint mode
    (``continuous_transforms.py:83``, deprecated ``odeint.py:6-284``).
    """
    return solve(lambda t, y: f(t, y, params), y0, t0, t1)


def _adjoint_fwd(solve, f, t0, t1, params, y0):
    y1 = odeint_adjoint(solve, f, t0, t1, params, y0)
    return y1, (params, y1)


def _adjoint_bwd(solve, f, t0, t1, res, g):
    params, y1 = res
    flat_p, unravel = ravel_pytree(params)
    n = y1.shape[-1]

    def aug_dyn(t, s):
        y = s[:n]
        a_y = s[n : 2 * n]
        dy, vjp_fn = jax.vjp(lambda y, p: f(t, y, p), y, unravel(flat_p))
        a_y_dot, a_p_tree = vjp_fn(a_y)
        a_p_dot, _ = ravel_pytree(a_p_tree)
        return jnp.concatenate([dy, -a_y_dot, -a_p_dot], axis=-1)

    s1 = jnp.concatenate([y1, g, jnp.zeros_like(flat_p)], axis=-1)
    s0 = solve(aug_dyn, s1, t1, t0)
    a_y0 = s0[n : 2 * n]
    a_p = unravel(s0[2 * n :])
    return (a_p, a_y0)


odeint_adjoint.defvjp(_adjoint_fwd, _adjoint_bwd)

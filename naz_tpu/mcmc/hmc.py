"""Leapfrog integrator and plain HMC kernel.

Pure functions over flat position vectors; everything vmaps over a chain
axis and shards over a mesh (see ``naz_tpu.parallel``). The potential is
``U(q) = -log posterior(q)`` in unconstrained space (built by
``naz_tpu.bayes.wrapper``). Diagonal metric: momentum ``r ~ N(0, M)``,
kinetic energy ``0.5 * r^T M^{-1} r`` with ``inv_mass = M^{-1}`` carried
explicitly (Stan convention: inv_mass adapts to the posterior variance).

Each leapfrog step is one fused XLA program: one ``value_and_grad`` of the
flow log-prob over the full training set — the north-star throughput metric
counts these (BASELINE.md "leapfrog grad-evals/s/chip").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LeapfrogState(NamedTuple):
    q: jnp.ndarray
    r: jnp.ndarray
    U: jnp.ndarray  # potential at q
    grad: jnp.ndarray  # dU/dq at q


def kinetic(r: jnp.ndarray, inv_mass: jnp.ndarray) -> jnp.ndarray:
    """Kinetic energy CENTERED by its expectation P/2: every use in this
    package differences kinetic energies (Metropolis delta-H, NUTS
    multinomial weights, divergence checks), so the constant cancels
    algebraically — but not numerically. At production dimension (P ~ 2e7
    weights) the raw 0.5*sum(r^2/m) is ~1e7, where float32 spacing is ~1:
    every accept decision would absorb O(1) nat of quantization noise.
    The centered summand r^2/m - 1 is O(1) per coordinate with mean 0, so
    the sum is O(sqrt(P)) and f32-exact to ~1e-3."""
    return 0.5 * jnp.sum(r * r * inv_mass - 1.0, axis=-1)


def leapfrog(
    potential_and_grad: Callable,
    state: LeapfrogState,
    step_size: jnp.ndarray,
    inv_mass: jnp.ndarray,
) -> LeapfrogState:
    """One velocity-Verlet step (reusing the cached gradient)."""
    r_half = state.r - 0.5 * step_size * state.grad
    q_new = state.q + step_size * inv_mass * r_half
    U_new, grad_new = potential_and_grad(q_new)
    r_new = r_half - 0.5 * step_size * grad_new
    return LeapfrogState(q_new, r_new, U_new, grad_new)


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    num_steps: int = 32
    max_delta_energy: float = 1000.0


class HMCInfo(NamedTuple):
    accept_prob: jnp.ndarray
    accepted: jnp.ndarray
    energy: jnp.ndarray
    diverging: jnp.ndarray
    num_grad_evals: jnp.ndarray


def hmc_step(
    potential_and_grad: Callable,
    q: jnp.ndarray,
    U: jnp.ndarray,
    grad: jnp.ndarray,
    key,
    step_size,
    inv_mass,
    config: HMCConfig = HMCConfig(),
):
    """One Metropolis-corrected HMC transition; returns (q, U, grad, info)."""
    k_mom, k_acc = jax.random.split(key)
    r0 = jax.random.normal(k_mom, q.shape) / jnp.sqrt(inv_mass)
    H0 = U + kinetic(r0, inv_mass)

    def body(_, s):
        return leapfrog(potential_and_grad, s, step_size, inv_mass)

    s = lax.fori_loop(0, config.num_steps, body, LeapfrogState(q, r0, U, grad))
    H1 = s.U + kinetic(s.r, inv_mass)
    delta = H1 - H0
    diverging = delta > config.max_delta_energy
    accept_prob = jnp.minimum(1.0, jnp.exp(-jnp.where(jnp.isnan(delta), jnp.inf, delta)))
    accept = jax.random.uniform(k_acc, ()) < accept_prob

    q_new = jnp.where(accept, s.q, q)
    U_new = jnp.where(accept, s.U, U)
    grad_new = jnp.where(accept, s.grad, grad)
    info = HMCInfo(
        accept_prob=accept_prob,
        accepted=accept,
        energy=H1,
        diverging=diverging,
        num_grad_evals=jnp.array(config.num_steps, jnp.int32),
    )
    return q_new, U_new, grad_new, info


def find_reasonable_step_size(
    potential_and_grad: Callable,
    q: jnp.ndarray,
    key,
    inv_mass: jnp.ndarray,
    init_step: float = 1.0,
    target: float = 0.8,
    max_iters: int = 60,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stan's heuristic: double/halve until accept prob crosses the target.

    Uses a single leapfrog step's energy change; runs as a bounded
    ``while_loop`` so it vmaps over chains. Returns ``(step, n_evals)``
    where ``n_evals`` counts the gradient evaluations spent probing (each
    trial step is one leapfrog = one grad eval) — callers fold it into
    their warmup grad-eval diagnostics.
    """
    U0, grad0 = potential_and_grad(q)
    r0 = jax.random.normal(key, q.shape) / jnp.sqrt(inv_mass)
    H0 = U0 + kinetic(r0, inv_mass)

    def accept_prob(step):
        s = leapfrog(potential_and_grad, LeapfrogState(q, r0, U0, grad0), step, inv_mass)
        H1 = s.U + kinetic(s.r, inv_mass)
        delta = jnp.where(jnp.isnan(H1), jnp.inf, H1 - H0)
        return jnp.exp(jnp.minimum(0.0, -delta))

    p0 = accept_prob(jnp.asarray(init_step, q.dtype))
    direction = jnp.where(p0 > 0.5, 1.0, -1.0)

    # carry the accept prob so each candidate step is probed exactly once
    # (evaluating it in cond re-ran the leapfrog on every check — a
    # duplicated gradient per iteration — and made the eval count drift
    # from the work actually performed)
    def cond(carry):
        step, p, i = carry
        crossed = jnp.where(direction > 0, p <= 0.5, p >= 0.5)
        return (~crossed) & (i < max_iters)

    def body(carry):
        step, p, i = carry
        new = step * jnp.where(direction > 0, 2.0, 0.5)
        return new, accept_prob(new), i + 1

    step, _, iters = lax.while_loop(
        cond,
        body,
        (jnp.asarray(init_step, q.dtype), p0, jnp.zeros((), jnp.int32)),
    )
    # 1 eval for (U0, grad0), 1 for p0, and one per body trial step
    return step, iters + 2

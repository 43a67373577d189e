"""Warmup adaptation: dual-averaging step size, Welford diagonal mass.

We own the sampler (the reference delegates to numpyro's NUTS,
``/root/reference/src/naz/flows/bflow_jax_maf.py:321-324``); this module
implements the standard Stan-style machinery as pure pytree state updates so
the whole warmup runs inside ``lax.scan``/``vmap`` over chains.

Schedule: Stan's three phases — an initial fast interval (step size only),
doubling "slow" windows collecting position variance for the mass matrix
(step size re-initialized at each window close), and a terminal fast
interval. Window boundaries are computed host-side (static) and passed in as
a per-step flag array, so the in-program logic is branch-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray  # current log step size
    log_step_avg: jnp.ndarray  # averaged iterate (used after warmup)
    s_bar: jnp.ndarray  # running average of (target - accept) stats
    t: jnp.ndarray  # iteration counter
    mu: jnp.ndarray  # shrinkage target (log(10*eps0))


def da_init(step_size: jnp.ndarray) -> DualAveragingState:
    log_eps = jnp.log(step_size)
    return DualAveragingState(
        log_step=log_eps,
        log_step_avg=log_eps,
        s_bar=jnp.zeros_like(log_eps),
        t=jnp.zeros_like(log_eps),
        mu=jnp.log(10.0) + log_eps,
    )


def da_update(
    state: DualAveragingState,
    accept_prob: jnp.ndarray,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    """Nesterov dual averaging, Hoffman & Gelman (2014) eq. 6 / Stan's
    ``stepsize_adaptation``: the statistic enters through the running
    average ``s_bar`` with gain ``1/(t+t0)`` and the iterate is pulled from
    ``mu`` by ``s_bar * sqrt(t)/gamma``."""
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    s_bar = (1.0 - eta_h) * state.s_bar + eta_h * (target - accept_prob)
    log_step = state.mu - s_bar * jnp.sqrt(t) / gamma
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, s_bar, t, state.mu)


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros(dim, dtype), m2=jnp.zeros(dim, dtype), count=jnp.zeros((), dtype)
    )


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, regularize: bool = True) -> jnp.ndarray:
    """Sample variance with Stan's shrinkage toward unit scale."""
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def build_warmup_schedule(
    num_warmup: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    base_window: int = 25,
) -> tuple[np.ndarray, np.ndarray]:
    """Return per-step flags (is_slow, window_end) of length num_warmup.

    ``is_slow[i]``: step i collects variance for the mass matrix.
    ``window_end[i]``: step i closes a slow window (mass updated, step-size
    adaptation restarted).
    """
    if num_warmup <= 0:
        return np.zeros(0, bool), np.zeros(0, bool)
    if num_warmup < init_buffer + term_buffer + base_window:
        # degenerate short warmup: single slow window in the middle.
        # The terminal buffer must stay long enough for dual averaging to
        # re-equilibrate after the LAST mass update resets it — ~7 post-
        # window iterations froze eps 2-3x above equilibrium and produced
        # accept 0.14 in sampling at the 19M-weight 4-param run
        # (RESULTS.md §6), where 10% of a 60-iteration warmup left the
        # averaged step mid-oscillation. 25% is the measured-safe floor.
        init_buffer = max(1, int(0.15 * num_warmup))
        term_buffer = max(1, int(0.25 * num_warmup))

    is_slow = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    slow_len = num_warmup - init_buffer - term_buffer
    if slow_len <= 0:
        return is_slow, window_end

    is_slow[init_buffer : init_buffer + slow_len] = True
    # doubling windows: base, 2*base, 4*base, ..., last absorbs the remainder
    start = init_buffer
    size = base_window
    while start < init_buffer + slow_len:
        end = start + size
        if end + 2 * size > init_buffer + slow_len:
            end = init_buffer + slow_len
        end = min(end, init_buffer + slow_len)
        window_end[end - 1] = True
        start = end
        size *= 2
    return is_slow, window_end


def welford_merge_batch(state: WelfordState, x_batch: jnp.ndarray) -> WelfordState:
    """Fold a whole (B, dim) batch into the accumulator at once (Chan's
    parallel-variance merge; algebraically exact vs feeding the B samples
    sequentially).

    Mesh-friendly: when the batch axis is sharded (e.g. MCMC chains over the
    ``chains`` mesh axis), the ``mean``/``sum`` reductions lower to psums —
    unlike a sequential ``fori_loop`` feed, which would gather one remote
    row per step.
    """
    b = x_batch.shape[0]
    batch_mean = jnp.mean(x_batch, axis=0)
    batch_m2 = jnp.sum((x_batch - batch_mean) ** 2, axis=0)
    count = state.count + b
    delta = batch_mean - state.mean
    mean = state.mean + delta * (b / count)
    m2 = state.m2 + batch_m2 + delta * delta * (state.count * b / count)
    return WelfordState(mean, m2, count)

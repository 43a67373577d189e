"""Iterative No-U-Turn sampler (multinomial NUTS), fixed-shape and vmappable.

The reference relies on numpyro's NUTS (``/root/reference/src/naz/flows/
bflow_jax_maf.py:321-324``); per the build plan we own the kernel. This is
the standard iterative formulation: no recursion, a doubling ``while_loop``
with an inner leapfrog ``while_loop``, and **O(max_depth) checkpoint
storage** for the sub-subtree U-turn checks.

Checkpoint scheme (derived from the binary-counter structure of a
depth-``d`` subtree built leaf-by-leaf, 0-indexed leaf ``i``):

* every *even* leaf ``i`` is the left boundary of the pending binary
  intervals that start at it; its momentum and the cumulative momentum sum
  *before* it are stored at slot ``popcount(i)``;
* after every *odd* leaf ``i``, exactly ``t = trailing_ones(i)`` binary
  intervals ``[i - 2^k + 1, i]`` (``k = 1..t``) complete; their left
  boundaries sit at slots ``popcount(i-1), popcount(i-1)-1, ...`` and are
  checked against the current leaf with the generalized U-turn criterion
  ``rho . (M^{-1} r_left) <= 0  or  rho . (M^{-1} r_right) <= 0``.

Proposals are progressive-multinomial within a subtree (leaf accepted with
probability ``w_leaf / w_subtree_so_far``) and biased across the doubling
(``min(1, w_new / w_old)``), i.e. the Betancourt (2017) scheme used by Stan.

A subtree that U-turns or diverges internally terminates the trajectory
without merging its proposal; its leaves still feed the dual-averaging
acceptance statistic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from naz_tpu.mcmc.hmc import LeapfrogState, kinetic, leapfrog


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    max_depth: int = 10
    max_delta_energy: float = 1000.0


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray  # mean leaf acceptance statistic (for DA)
    num_grad_evals: jnp.ndarray
    depth: jnp.ndarray
    diverging: jnp.ndarray
    turning: jnp.ndarray
    # potential U at the accepted point (NOT the Hamiltonian: the accepted
    # leaf's momentum is not retained once the trajectory is sampled)
    potential_energy: jnp.ndarray


def _uturn(rho, r_left, r_right, inv_mass):
    v_rho = rho * inv_mass
    return (jnp.dot(v_rho, r_left) <= 0.0) | (jnp.dot(v_rho, r_right) <= 0.0)


def _trailing_ones(i):
    # lowest zero bit of i is 2^t  ->  t = popcount(2^t - 1)
    lowzero = jnp.bitwise_and(i + 1, jnp.bitwise_not(i))
    return lax.population_count(lowzero - 1)


class _SubtreeResult(NamedTuple):
    # boundary state at the far end (in build direction)
    end: LeapfrogState
    rho: jnp.ndarray
    q_prop: jnp.ndarray
    U_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_weight: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray


def _build_subtree(
    pg: Callable,
    start: LeapfrogState,
    depth: jnp.ndarray,
    v: jnp.ndarray,
    step_size: jnp.ndarray,
    inv_mass: jnp.ndarray,
    H0: jnp.ndarray,
    key,
    max_depth: int,
    max_delta_energy: float,
) -> _SubtreeResult:
    dim = start.q.shape[-1]
    num_leaves = jnp.left_shift(1, depth)

    r_ckpt = jnp.zeros((max_depth + 1, dim), start.q.dtype)
    rho_before_ckpt = jnp.zeros((max_depth + 1, dim), start.q.dtype)

    init = dict(
        i=jnp.zeros((), jnp.int32),
        s=start,
        rho=jnp.zeros(dim, start.q.dtype),
        r_ckpt=r_ckpt,
        rho_before_ckpt=rho_before_ckpt,
        q_prop=start.q,
        U_prop=start.U,
        grad_prop=start.grad,
        log_weight=-jnp.inf,
        sum_accept=jnp.zeros(()),
        n_leaves=jnp.zeros((), jnp.int32),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        key=key,
    )

    def cond(c):
        return (c["i"] < num_leaves) & ~c["turning"] & ~c["diverging"]

    def body(c):
        i = c["i"]
        s = leapfrog(pg, c["s"], v * step_size, inv_mass)
        H = s.U + kinetic(s.r, inv_mass)
        delta = H - H0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        diverging = delta > max_delta_energy

        # checkpoint on even leaves (left boundary of pending intervals)
        is_even = (i % 2) == 0
        slot = lax.population_count(i)
        r_ckpt = jnp.where(
            is_even, c["r_ckpt"].at[slot].set(s.r), c["r_ckpt"]
        )
        rho_before_ckpt = jnp.where(
            is_even, c["rho_before_ckpt"].at[slot].set(c["rho"]), c["rho_before_ckpt"]
        )

        rho = c["rho"] + s.r

        # U-turn checks for intervals completed at odd leaves
        t = _trailing_ones(i)
        sp = lax.population_count(i - 1) + 1  # stack pointer after even-store

        def check(k, turning):
            slot_k = sp - k
            active = (k >= 1) & (k <= t) & ~is_even
            rho_int = rho - rho_before_ckpt[slot_k]
            u = _uturn(rho_int, r_ckpt[slot_k], s.r, inv_mass)
            return turning | (active & u)

        turning = lax.fori_loop(1, max_depth + 1, check, c["turning"])

        # progressive multinomial proposal within the subtree
        log_w_leaf = -delta
        log_weight = jnp.logaddexp(c["log_weight"], log_w_leaf)
        key, k_u = jax.random.split(c["key"])
        accept_leaf = jnp.log(jax.random.uniform(k_u, ())) < (log_w_leaf - log_weight)
        q_prop = jnp.where(accept_leaf, s.q, c["q_prop"])
        U_prop = jnp.where(accept_leaf, s.U, c["U_prop"])
        grad_prop = jnp.where(accept_leaf, s.grad, c["grad_prop"])

        sum_accept = c["sum_accept"] + jnp.exp(jnp.minimum(0.0, -delta))

        return dict(
            i=i + 1,
            s=s,
            rho=rho,
            r_ckpt=r_ckpt,
            rho_before_ckpt=rho_before_ckpt,
            q_prop=q_prop,
            U_prop=U_prop,
            grad_prop=grad_prop,
            log_weight=log_weight,
            sum_accept=sum_accept,
            n_leaves=c["n_leaves"] + 1,
            turning=turning,
            diverging=diverging,
            key=key,
        )

    c = lax.while_loop(cond, body, init)
    return _SubtreeResult(
        end=c["s"],
        rho=c["rho"],
        q_prop=c["q_prop"],
        U_prop=c["U_prop"],
        grad_prop=c["grad_prop"],
        log_weight=c["log_weight"],
        sum_accept=c["sum_accept"],
        n_leaves=c["n_leaves"],
        turning=c["turning"],
        diverging=c["diverging"],
    )


def nuts_step(
    potential_and_grad: Callable,
    q: jnp.ndarray,
    U: jnp.ndarray,
    grad: jnp.ndarray,
    key,
    step_size,
    inv_mass,
    config: NUTSConfig = NUTSConfig(),
):
    """One NUTS transition; returns ``(q, U, grad, NUTSInfo)``.

    ``U``/``grad`` are the cached potential and gradient at ``q`` (one
    evaluation per *trajectory* is saved by threading them through).
    """
    pg = potential_and_grad
    k_mom, k_loop = jax.random.split(key)
    r0 = jax.random.normal(k_mom, q.shape) / jnp.sqrt(inv_mass)
    H0 = U + kinetic(r0, inv_mass)

    init = dict(
        depth=jnp.zeros((), jnp.int32),
        left=LeapfrogState(q, r0, U, grad),
        right=LeapfrogState(q, r0, U, grad),
        rho=r0,
        q_prop=q,
        U_prop=U,
        grad_prop=grad,
        log_weight=jnp.zeros(()),  # initial point has weight 1
        sum_accept=jnp.zeros(()),
        n_leaves=jnp.zeros((), jnp.int32),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        key=k_loop,
    )

    def cond(c):
        return (c["depth"] < config.max_depth) & ~c["turning"] & ~c["diverging"]

    def body(c):
        key, k_dir, k_sub, k_merge = jax.random.split(c["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        v = jnp.where(go_right, 1.0, -1.0)
        start = jax.tree.map(
            lambda a, b: jnp.where(go_right, a, b), c["right"], c["left"]
        )
        sub = _build_subtree(
            pg,
            start,
            c["depth"],
            v,
            step_size,
            inv_mass,
            H0,
            k_sub,
            config.max_depth,
            config.max_delta_energy,
        )

        sub_ok = ~sub.turning & ~sub.diverging

        # biased progressive sampling across the doubling
        accept_sub = (
            jnp.log(jax.random.uniform(k_merge, ()))
            < sub.log_weight - c["log_weight"]
        ) & sub_ok
        q_prop = jnp.where(accept_sub, sub.q_prop, c["q_prop"])
        U_prop = jnp.where(accept_sub, sub.U_prop, c["U_prop"])
        grad_prop = jnp.where(accept_sub, sub.grad_prop, c["grad_prop"])
        log_weight = jnp.where(
            sub_ok, jnp.logaddexp(c["log_weight"], sub.log_weight), c["log_weight"]
        )

        # extend the boundary in the chosen direction (only if subtree ok)
        def merge_boundary(old, new):
            return jax.tree.map(
                lambda o, n: jnp.where(sub_ok, n, o), old, new
            )

        left = jax.tree.map(
            lambda l, e: jnp.where(sub_ok & ~go_right, e, l), c["left"], sub.end
        )
        right = jax.tree.map(
            lambda r, e: jnp.where(sub_ok & go_right, e, r), c["right"], sub.end
        )
        rho = jnp.where(sub_ok, c["rho"] + sub.rho, c["rho"])

        merged_turning = _uturn(rho, left.r, right.r, inv_mass)
        turning = sub.turning | (sub_ok & merged_turning)

        return dict(
            depth=c["depth"] + 1,
            left=left,
            right=right,
            rho=rho,
            q_prop=q_prop,
            U_prop=U_prop,
            grad_prop=grad_prop,
            log_weight=log_weight,
            sum_accept=c["sum_accept"] + sub.sum_accept,
            n_leaves=c["n_leaves"] + sub.n_leaves,
            turning=turning,
            diverging=sub.diverging,
            key=key,
        )

    c = lax.while_loop(cond, body, init)

    info = NUTSInfo(
        accept_prob=c["sum_accept"] / jnp.maximum(c["n_leaves"], 1),
        num_grad_evals=c["n_leaves"],
        depth=c["depth"],
        diverging=c["diverging"],
        turning=c["turning"],
        potential_energy=c["U_prop"],
    )
    return c["q_prop"], c["U_prop"], c["grad_prop"], info

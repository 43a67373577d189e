"""ChEES-HMC: cross-chain adaptive HMC (Hoffman, Radul & Sountsov, AISTATS
2021 — "An Adaptive MCMC Scheme for Setting Trajectory Lengths in
Hamiltonian Monte Carlo").

Why this kernel exists here (TPU-first rationale): NUTS builds a
data-dependent trajectory *per chain* — under ``vmap`` every chain pays the
deepest chain's tree, half the gradient evaluations land in rejected
subtrees, and the tree bookkeeping is control flow the MXU can't help
with. ChEES-HMC replaces the tree with a *learned* trajectory length: all
chains run plain jittered HMC in lockstep (one shared leapfrog count per
iteration — a perfectly static program), and the trajectory length is
adapted by maximizing the Change-in-Estimator-of-Expected-Square (ChEES)
criterion with a cross-chain gradient estimate. The cross-chain reductions
(means over the chain axis) are exactly the cheap collectives a TPU mesh
gives us (``psum`` when the chain axis is sharded — ``naz_tpu.parallel``).

The reference has no counterpart (it delegates to numpyro NUTS,
``/root/reference/src/naz/flows/bflow_jax_maf.py:321-324``); this kernel is
an addition on the BASELINE.md north-star metric (effective samples/s).

Algorithm (paper Alg. 2, adapted to a diagonal metric):

* iteration t draws one Halton-sequence jitter ``h_t ∈ (0,1]`` shared by
  all chains; every chain integrates ``L = ceil(h_t * T / eps)`` leapfrog
  steps (same L for all chains — lockstep);
* step size ``eps`` adapts by dual averaging on the cross-chain mean
  acceptance toward 0.651 (the optimal rate for jittered HMC);
* trajectory length ``T`` adapts by Adam ascent on the per-iteration
  ChEES gradient estimate: with ``x = q - mean_c(q)``,
  ``x' = q' - mean_c(q')`` (means over chains, proposals ``q'``),
  ``v' = M^{-1} r'`` the final velocity,
  ``g_c = (|x'|^2 - |x|^2) * <x', v'>`` per chain, combined as the
  acceptance-weighted mean times the jitter ``h_t``;
* the diagonal mass matrix adapts from a *cross-chain* Welford estimate
  (every chain feeds one accumulator — C samples per iteration instead of
  one), on the Stan windowed schedule shared with the NUTS warmup.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from naz_tpu.mcmc.adapt import (
    build_warmup_schedule,
    da_init,
    da_update,
    welford_init,
    welford_merge_batch,
    welford_variance,
)
from naz_tpu.mcmc.hmc import LeapfrogState, kinetic, leapfrog, find_reasonable_step_size


def halton(index: jnp.ndarray, base: int = 2, n_bits: int = 31) -> jnp.ndarray:
    """Radical-inverse (Halton) low-discrepancy sequence member in (0, 1).

    ``index`` is a non-negative integer array; base 2 is a bit reversal.
    The paper jitters trajectory lengths with a Halton sequence rather than
    iid uniforms so consecutive trajectory lengths stratify (0,1] evenly.
    """
    i = index.astype(jnp.uint32) + 1  # skip h(0) = 0

    def body(k, carry):
        f, i, inv = carry
        digit = i % base
        f = f + digit.astype(jnp.float32) * inv
        return f, i // base, inv / base

    f, _, _ = lax.fori_loop(
        0, n_bits, body, (jnp.float32(0.0), i, jnp.float32(1.0 / base))
    )
    return f


class AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray


def _adam_init() -> AdamState:
    z = jnp.zeros(())
    return AdamState(z, z, z)


def _adam_update(s: AdamState, grad, lr, b1=0.9, b2=0.999, eps=1e-8):
    t = s.t + 1.0
    m = b1 * s.m + (1 - b1) * grad
    v = b2 * s.v + (1 - b2) * grad * grad
    mhat = m / (1 - b1**t)
    vhat = v / (1 - b2**t)
    return AdamState(m, v, t), lr * mhat / (jnp.sqrt(vhat) + eps)


@dataclasses.dataclass(frozen=True)
class ChEESConfig:
    num_warmup: int = 500
    num_samples: int = 500
    num_chains: int = 16
    target_accept: float = 0.651  # optimal acceptance for jittered HMC
    adam_lr: float = 0.025  # Adam step on log T (paper's default)
    max_leapfrogs: int = 1024  # hard cap on steps per trajectory
    init_step_size: float = 0.1
    init_traj_len: float = 1.0  # initial mean trajectory length T
    adapt_mass: bool = True
    # floor on leapfrog steps per trajectory (and on T via the adaptation
    # clip, T >= min_leapfrogs * eps). A hard lower bound on how far a
    # trajectory can move: the 19M-weight production failure mode was T
    # collapsing to ~6 steps of a tiny eps, freezing every chain in place.
    min_leapfrogs: int = 1
    # sampling-phase output thinning, in draws: keep every thin_draws-th
    # full position vector (at steps_per_program chunk granularity); every
    # draw still emits scalar diagnostics (exact potential energy, first 8
    # coordinates, acceptance, leapfrog count). At production scale the
    # remote-tunnel device->host link moves ~5 MB/s, so streaming every
    # 76 MB draw vector (19M weights) dominates sampling wall-clock; the
    # full trace only feeds R-hat/ESS diagnostics, which the scalar
    # projections carry equally well. 1 = keep every draw (full q trace).
    thin_draws: int = 1
    seed: int = 0
    steps_per_program: int = 50
    # Split each trajectory's leapfrog integration across multiple device
    # programs of at most this many steps (0 = whole trajectory in one
    # program, the default). The production environment's remote worker
    # kills device programs running longer than ~1 minute, which at the
    # 19M-weight scale caps max_leapfrogs at ~96 — 13% of the adapted
    # trajectory length T/eps ~ 718, forcing diffusive exploration whose
    # mixing per chip-second scales linearly in L (PERFORMANCE.md r4).
    # With chunking the host drives ceil(L/chunk) dispatches per draw
    # (carries stay on-device; ~0.1-0.4 s dispatch overhead each) and a
    # single compiled segment program with a dynamic trip count serves
    # every chunk size, so L can reach the adapted T. Applies to BOTH the
    # sampling phase and warmup (round 5): warmup trajectories split the
    # same way, with the adaptation tail (accept/DA/Adam/Welford/window
    # close) as its own cheap program — parity-tested against the
    # monolithic warmup in tests/test_chees.py.
    leapfrogs_per_program: int = 0
    # Warmup-phase leapfrog cap (0 = use max_leapfrogs). Warmup cost
    # scales with the per-iteration leapfrog budget, and a capped warmup
    # still adapts T correctly ABOVE the cap (the non-ratcheting clip
    # below), so the production recipe is a tight warmup cap (~96) with a
    # full-length max_leapfrogs for sampling — previously only expressible
    # as two CLI invocations against one checkpoint dir.
    warmup_max_leapfrogs: int = 0
    # chain execution inside the program: "vmap" (lockstep batched — the
    # natural ChEES layout) or "map" (sequential; only when one chain
    # saturates the chip)
    chain_exec: str = "vmap"
    verbose: bool = False


class ChEESState(NamedTuple):
    """Sampler + adaptation state. Chains lead q/U/grad/key; the step size,
    trajectory length, and mass are shared across chains (cross-chain
    adaptation is the point of the scheme)."""

    q: jnp.ndarray  # (C, dim)
    U: jnp.ndarray  # (C,)
    grad: jnp.ndarray  # (C, dim)
    key: jnp.ndarray  # (C, 2) per-chain keys
    step_size: jnp.ndarray  # scalar
    traj_len: jnp.ndarray  # scalar T
    inv_mass: jnp.ndarray  # (dim,)
    iteration: jnp.ndarray  # scalar int32 (drives the Halton sequence)


class ChEESInfo(NamedTuple):
    accept_prob: jnp.ndarray  # (C,)
    num_leapfrogs: jnp.ndarray  # scalar — shared by all chains
    diverging: jnp.ndarray  # (C,)


def _check_chain_count(num_chains: int) -> None:
    """The ChEES criterion is a cross-chain expectation; its gradient
    estimate has ``num_chains`` samples per iteration. With 2 chains the
    estimate is noisy enough for Adam to random-walk T downward until the
    chains freeze (measured at the 19M-weight production scale: T collapsed
    to 0.0022, split-R̂ 30-365). Refuse <2, warn <4."""
    if num_chains < 2:
        raise ValueError(
            "ChEES-HMC needs at least 2 chains: the trajectory-length "
            "criterion is a cross-chain expectation (use kernel='nuts' for "
            "single-chain adaptation)"
        )
    if num_chains < 4:
        import warnings

        warnings.warn(
            f"ChEES-HMC with {num_chains} chains: the cross-chain ChEES "
            "gradient is a noisy few-sample estimate and trajectory "
            "adaptation degrades; use >= 4 chains (or kernel='nuts', whose "
            "adaptation is per-chain)",
            stacklevel=3,
        )


def load_adaptation(path: str) -> tuple[np.ndarray, float, float]:
    """Read ``(inv_mass, step_size, traj_len)`` from a ChEES checkpoint.

    ``path`` is a checkpoint dir (containing ``chees_state.npz``) or the
    state file itself. Leaves are read by :class:`ChEESState` field index
    (the ``save_pytree`` order), NOT through a template pytree, so the
    source run's chain count does not have to match the new run's.

    This is the warm-start path for prior-scale sweeps (the reference's
    sigma0 calibration study, ``plot_callibration.py:22-36``): identity-
    mass warmup spends its first ~100 iterations crawling at eps ~ 5e-4
    rediscovering the MLE's local scales on every run (measured ~15 min
    of each production warmup, PERFORMANCE.md); adjacent sigma0 posteriors
    share those scales to first order, so seeding eps/T/mass from the
    previous run's adapted state removes the crawl while the windowed
    warmup still re-adapts everything for the new posterior."""
    import os

    if os.path.isdir(path):
        path = os.path.join(path, "chees_state.npz")
    fields = list(ChEESState._fields)
    with np.load(path) as z:
        # positional read: guard against a checkpoint written by a
        # different ChEESState layout (field added/reordered) silently
        # mis-assigning leaves — the npz stores no names, so the only
        # cheap invariants are the leaf count and the scalar-ness of the
        # adaptation leaves
        n_leaves = sum(1 for k in z.files if k.startswith("leaf_"))
        if n_leaves != len(fields):
            raise ValueError(
                f"{path}: {n_leaves} leaves but ChEESState has "
                f"{len(fields)} fields — checkpoint written by a "
                "different state layout; refusing positional read"
            )
        step_leaf = z[f"leaf_{fields.index('step_size')}"]
        traj_leaf = z[f"leaf_{fields.index('traj_len')}"]
        if step_leaf.ndim != 0 or traj_leaf.ndim != 0:
            raise ValueError(
                f"{path}: step_size/traj_len leaves are not scalars "
                f"(shapes {step_leaf.shape}/{traj_leaf.shape}) — "
                "checkpoint layout mismatch"
            )
        inv_mass = np.asarray(z[f"leaf_{fields.index('inv_mass')}"])
        step_size = float(step_leaf)
        traj_len = float(traj_leaf)
    return inv_mass, step_size, traj_len


def chees_init(
    potential: Callable,
    q0: jnp.ndarray,
    cfg: ChEESConfig,
    fast_potential: Callable = None,
    init_inv_mass: jnp.ndarray = None,
) -> ChEESState:
    """``init_inv_mass``: optional starting diagonal inverse mass (e.g.
    ``BayesianFlow.curvature_inv_mass``); defaults to the identity.
    Warmup still adapts it."""
    _check_chain_count(q0.shape[0])
    U = jax.vmap(potential)(q0)  # exact energies
    grad = jax.vmap(jax.grad(fast_potential or potential))(q0)
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), q0.shape[0])
    if init_inv_mass is None:
        inv_mass = jnp.ones((q0.shape[-1],), q0.dtype)
    else:
        inv_mass = jnp.asarray(init_inv_mass, q0.dtype)
    return ChEESState(
        q=q0,
        U=U,
        grad=grad,
        key=keys,
        step_size=jnp.asarray(cfg.init_step_size, q0.dtype),
        traj_len=jnp.asarray(cfg.init_traj_len, q0.dtype),
        inv_mass=inv_mass,
        iteration=jnp.zeros((), jnp.int32),
    )


def _trajectories(pg, state: ChEESState, cfg: ChEESConfig, cap: int = None):
    """Run one jittered-HMC iteration for all chains in lockstep.

    Returns (proposal LeapfrogState batched over chains, H0 (C,), new keys,
    L, h). ``H0`` uses ``state.U`` — the *exact* potential when running
    mixed precision (gradients from a fast approximate potential are fine:
    leapfrog with any deterministic field stays volume-preserving and
    reversible, so exact endpoint energies keep the stationary
    distribution exact). ``cap`` overrides ``cfg.max_leapfrogs`` (the
    warmup phase may run a tighter leapfrog budget)."""
    h = halton(state.iteration)
    # shared leapfrog count; ceil so L >= 1
    L = jnp.ceil(h * state.traj_len / state.step_size).astype(jnp.int32)
    L = jnp.clip(L, max(1, cfg.min_leapfrogs), cap or cfg.max_leapfrogs)

    keys = jax.vmap(jax.random.split)(state.key)
    k_mom, k_next = keys[:, 0], keys[:, 1]
    r0 = jax.vmap(
        lambda k, q: jax.random.normal(k, q.shape) / jnp.sqrt(state.inv_mass)
    )(k_mom, state.q)
    H0 = state.U + kinetic(r0, state.inv_mass[None, :])

    if cfg.chain_exec == "vmap":
        step_all = jax.vmap(
            lambda s: leapfrog(pg, s, state.step_size, state.inv_mass)
        )
    elif cfg.chain_exec == "map":
        step_all = lambda s: lax.map(
            lambda si: leapfrog(pg, si, state.step_size, state.inv_mass), s
        )
    else:
        raise ValueError(f"chain_exec must be 'vmap' or 'map', got {cfg.chain_exec!r}")

    def body(_, s):
        return step_all(s)

    s0 = LeapfrogState(state.q, r0, state.U, state.grad)
    s1 = lax.fori_loop(0, L, body, s0)
    return s1, H0, k_next, L, h


def _accept(s1: LeapfrogState, H0, state: ChEESState, exact_U=None):
    """Metropolis accept probabilities with (optionally exact) endpoint
    energies. Returns (accept_prob, diverging, U1)."""
    U1 = exact_U(s1.q) if exact_U is not None else s1.U
    H1 = U1 + kinetic(s1.r, state.inv_mass[None, :])
    delta = jnp.where(jnp.isnan(H1 - H0), jnp.inf, H1 - H0)
    accept_prob = jnp.exp(jnp.minimum(0.0, -delta))
    diverging = delta > 1000.0
    return accept_prob, diverging, U1


def _chees_grad(q, proposal: LeapfrogState, accept_prob, inv_mass, h):
    """Acceptance-weighted ChEES gradient estimate wrt T (paper eq. 14)."""
    x = q - jnp.mean(q, axis=0)
    xp = proposal.q - jnp.mean(proposal.q, axis=0)
    vp = proposal.r * inv_mass[None, :]  # final velocity dq/dt
    delta_sq = jnp.sum(xp * xp, axis=-1) - jnp.sum(x * x, axis=-1)
    per_chain = delta_sq * jnp.sum(xp * vp, axis=-1)
    w = accept_prob / jnp.maximum(jnp.sum(accept_prob), 1e-12)
    g = h * jnp.sum(jnp.where(jnp.isfinite(per_chain), w * per_chain, 0.0))
    # diverged proposals (non-finite positions) have ~0 accept weight but
    # produce inf*0 = nan above; a single such iteration must not poison
    # the Adam state (and thereby T) for the rest of warmup
    return jnp.where(jnp.isfinite(g), g, 0.0)


def chees_step(
    pg: Callable, state: ChEESState, cfg: ChEESConfig, exact_U=None
) -> tuple[ChEESState, ChEESInfo]:
    """One (non-adapting) ChEES-HMC transition for all chains.

    ``exact_U``: optional batched exact potential for endpoint energies
    (mixed precision: ``pg`` from a fast approximate potential)."""
    s1, H0, k_next, L, h = _trajectories(pg, state, cfg)
    accept_prob, diverging, U1 = _accept(s1, H0, state, exact_U)
    k_acc = jax.vmap(lambda k: jax.random.fold_in(k, 1))(k_next)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(k_acc)
    accept = u < accept_prob
    q = jnp.where(accept[:, None], s1.q, state.q)
    U = jnp.where(accept, U1, state.U)
    grad = jnp.where(accept[:, None], s1.grad, state.grad)
    new_state = state._replace(
        q=q, U=U, grad=grad, key=k_next, iteration=state.iteration + 1
    )
    return new_state, ChEESInfo(accept_prob, L, diverging)


def make_chunked_step(pg: Callable, cfg: ChEESConfig, exact_U=None):
    """Host-driven ChEES transition with the trajectory split across
    watchdog-safe device programs (``cfg.leapfrogs_per_program`` steps
    max per program).

    Returns ``step(state) -> (new_state, ChEESInfo)`` — the same
    transition :func:`chees_step` computes (identical RNG stream, same
    Halton trajectory jitter, same MH correction), but as three jitted
    pieces the host sequences: ``_start`` (momentum draw + H0 + L),
    repeated ``_segment`` calls (a dynamic-trip-count leapfrog loop, so
    ONE compilation serves every chunk size), and ``_finish`` (exact-
    energy MH accept). Chain carries stay on-device between dispatches;
    the only device->host traffic per draw is the scalar ``L``."""
    chunk = int(cfg.leapfrogs_per_program)
    assert chunk > 0

    if cfg.chain_exec == "vmap":
        step_all = lambda s, eps, im: jax.vmap(
            lambda si: leapfrog(pg, si, eps, im)
        )(s)
    elif cfg.chain_exec == "map":
        step_all = lambda s, eps, im: lax.map(
            lambda si: leapfrog(pg, si, eps, im), s
        )
    else:
        raise ValueError(f"chain_exec must be 'vmap' or 'map', got {cfg.chain_exec!r}")

    @jax.jit
    def _start(state):
        h = halton(state.iteration)
        L = jnp.ceil(h * state.traj_len / state.step_size).astype(jnp.int32)
        L = jnp.clip(L, max(1, cfg.min_leapfrogs), cfg.max_leapfrogs)
        keys = jax.vmap(jax.random.split)(state.key)
        k_mom, k_next = keys[:, 0], keys[:, 1]
        r0 = jax.vmap(
            lambda k, q: jax.random.normal(k, q.shape) / jnp.sqrt(state.inv_mass)
        )(k_mom, state.q)
        H0 = state.U + kinetic(r0, state.inv_mass[None, :])
        s0 = LeapfrogState(state.q, r0, state.U, state.grad)
        return s0, H0, k_next, L

    @jax.jit
    def _segment(s, step_size, inv_mass, n):
        # dynamic trip count: runtime scales with the actual n <= chunk,
        # and one executable serves full chunks and the remainder alike
        return lax.fori_loop(0, n, lambda i, si: step_all(si, step_size, inv_mass), s)

    @jax.jit
    def _finish(state, s1, H0, k_next, L):
        accept_prob, diverging, U1 = _accept(s1, H0, state, exact_U)
        k_acc = jax.vmap(lambda k: jax.random.fold_in(k, 1))(k_next)
        u = jax.vmap(lambda k: jax.random.uniform(k, ()))(k_acc)
        accept = u < accept_prob
        q = jnp.where(accept[:, None], s1.q, state.q)
        U = jnp.where(accept, U1, state.U)
        grad = jnp.where(accept[:, None], s1.grad, state.grad)
        new_state = state._replace(
            q=q, U=U, grad=grad, key=k_next, iteration=state.iteration + 1
        )
        return new_state, ChEESInfo(accept_prob, L, diverging)

    def step(state):
        s1, H0, k_next, L = _start(state)
        L_host = int(L)  # one scalar transfer per draw
        done = 0
        while done < L_host:
            n = min(chunk, L_host - done)
            s1 = _segment(s1, state.step_size, state.inv_mass, n)
            done += n
        return _finish(state, s1, H0, k_next, L)

    return step


class _WarmupCarry(NamedTuple):
    state: ChEESState
    da: object
    adam: AdamState
    log_T: jnp.ndarray
    wf: object
    n_evals: jnp.ndarray  # per-chain leapfrog count (multiply by C at the end)
    probe_evals: jnp.ndarray  # single-chain step-size-probe grad evals


def _worst_chain(q, grad, key):
    """Probe position/key from the steepest-gradient chain: the chain most
    likely to need the smallest stable step (probing chain 0 can return an
    unrepresentatively large step when jittered inits land chain 0 in a
    flat region — VERDICT r2 weak #8)."""
    i = jnp.argmax(jnp.sum(grad * grad, axis=-1))
    return q[i], key[i]


def _exact_and_fast(potential, fast_potential, chain_exec):
    """(pg for leapfrog, batched exact-U fn or None)."""
    pg = jax.value_and_grad(fast_potential or potential)
    if fast_potential is None:
        return pg, None
    if chain_exec == "map":
        return pg, lambda q: lax.map(potential, q)
    return pg, jax.vmap(potential)


def chees_warmup(
    potential: Callable,
    state: ChEESState,
    cfg: ChEESConfig,
    fast_potential: Callable = None,
) -> tuple[ChEESState, dict]:
    """Adapt eps (dual averaging), T (Adam on ChEES), mass (cross-chain
    Welford on the Stan windowed schedule). Chunked like the NUTS driver.

    ``fast_potential``: optional cheap approximation (e.g. the
    ``compute_dtype='bfloat16'`` flow) used for leapfrog *gradients*;
    accept energies always come from ``potential``."""
    pg, exact_U = _exact_and_fast(potential, fast_potential, cfg.chain_exec)
    dim = state.q.shape[-1]
    is_slow_np, wend_np = build_warmup_schedule(cfg.num_warmup)

    @jax.jit
    def _init(state: ChEESState):
        # probe a reasonable step size from the steepest-gradient chain
        q_probe, k_probe = _worst_chain(state.q, state.grad, state.key)
        step0, ev0 = find_reasonable_step_size(
            pg, q_probe, k_probe, state.inv_mass, init_step=cfg.init_step_size
        )
        state = state._replace(step_size=step0)
        return _WarmupCarry(
            state=state,
            da=da_init(step0),
            adam=_adam_init(),
            log_T=jnp.log(jnp.asarray(cfg.init_traj_len)),
            wf=welford_init(dim),
            n_evals=jnp.zeros((), jnp.int32),
            probe_evals=ev0,
        )

    def one_step(carry: _WarmupCarry, xs, traj=None):
        slow, wend = xs
        state = carry.state._replace(
            step_size=jnp.exp(carry.da.log_step),
            traj_len=jnp.exp(carry.log_T),
        )
        if traj is None:
            s1, H0, k_next, L, h = _trajectories(
                pg, state, cfg, cap=cfg.warmup_max_leapfrogs or None
            )
        else:
            # chunked warmup: the trajectory was integrated by the host
            # across watchdog-safe programs (same fields, same RNG stream)
            s1, H0, k_next, L, h = traj
        accept_prob, _div, U1 = _accept(s1, H0, state, exact_U)
        k_acc = jax.vmap(lambda k: jax.random.fold_in(k, 1))(k_next)
        u = jax.vmap(lambda k: jax.random.uniform(k, ()))(k_acc)
        accept = u < accept_prob
        q = jnp.where(accept[:, None], s1.q, state.q)
        U = jnp.where(accept, U1, state.U)
        grad = jnp.where(accept[:, None], s1.grad, state.grad)

        # step size: DA on cross-chain mean acceptance
        da = da_update(carry.da, jnp.mean(accept_prob), target=cfg.target_accept)

        # trajectory length: Adam ascent on the ChEES gradient. The update
        # is trust-regioned to +-adam_lr nats per iteration: Adam's
        # m/sqrt(v) ratio transiently exceeds 1 when fresh large gradients
        # hit a small second-moment estimate, and with a noisy few-chain
        # criterion those spikes compounded into an e^-6 collapse of T at
        # production scale (chains frozen, split-R-hat ~300). Clamping
        # bounds the worst-case drift to adam_lr * num_warmup nats.
        g = _chees_grad(state.q, s1, accept_prob, state.inv_mass, h)
        adam, delta = _adam_update(carry.adam, -g, cfg.adam_lr)  # minimize -ChEES
        log_T = carry.log_T - jnp.clip(delta, -cfg.adam_lr, cfg.adam_lr)
        # Keep T sane: at least min_leapfrogs steps; growth stops at
        # max_leapfrogs steps. The upper bound must never RATCHET the
        # carried T down through a transiently collapsed step size: in the
        # r2 production run eps briefly fell to ~3e-4 during early warmup
        # and the old two-sided clip pinned T <= max_leapfrogs*eps ~ 0.01
        # within 8 iterations — permanently, since the clip mutated the
        # carried state. T may therefore sit above max_leapfrogs*eps (the
        # per-iteration leapfrog count stays capped in _trajectories); it
        # just cannot grow further while it is.
        # ...and symmetrically, the lower bound (min_leapfrogs * eps) must
        # never RATCHET the carried T up through a transient eps SPIKE
        # (measured: a window-close re-probe briefly returned a large step
        # and the floor jumped T 1.3 -> 12 in one iteration). Either bound
        # may stop motion, neither may cause it.
        hi = jnp.maximum(jnp.log(cfg.max_leapfrogs * state.step_size), carry.log_T)
        lo = jnp.minimum(
            jnp.log(max(1, cfg.min_leapfrogs) * state.step_size), carry.log_T
        )
        lo = jnp.minimum(lo, hi)
        log_T = jnp.clip(log_T, lo, hi)

        # mass: the whole chain batch feeds the shared Welford accumulator
        # in one exact merge (collective-friendly when chains are sharded)
        wf = jax.tree.map(
            lambda a, b: jnp.where(slow, a, b),
            welford_merge_batch(carry.wf, q),
            carry.wf,
        )

        # window close: adopt variance, re-probe the step size under the
        # NEW metric (Stan's init_stepsize-after-metric-update), restart DA
        # and Welford. Restarting DA at the old step is not enough: the
        # metric swap rescales the stable step arbitrarily, and with a
        # short terminal buffer the averaged step never recovers (measured:
        # curvature-initialized warmup on a flow posterior ended with
        # accept ~0.001 from exactly this).
        def close(args):
            da, wf, q_now, k_now, g_now = args
            inv_mass = welford_variance(wf)
            q_probe, k_probe = _worst_chain(q_now, g_now, k_now)
            step, ev = find_reasonable_step_size(
                pg, q_probe, jax.random.fold_in(k_probe, 7), inv_mass,
                init_step=jnp.exp(da.log_step),
            )
            return da_init(step), welford_init(dim), inv_mass, ev

        def keep(args):
            da, wf, _q, _k, _g = args
            return da, wf, state.inv_mass, jnp.zeros((), jnp.int32)

        da, wf, inv_mass, probe_ev = lax.cond(
            wend if cfg.adapt_mass else jnp.asarray(False),
            close, keep, (da, wf, q, k_next, grad),
        )

        new_state = ChEESState(
            q=q,
            U=U,
            grad=grad,
            key=k_next,
            step_size=jnp.exp(da.log_step),
            traj_len=jnp.exp(log_T),
            inv_mass=inv_mass,
            iteration=state.iteration + 1,
        )
        out = _WarmupCarry(
            new_state, da, adam, log_T, wf, carry.n_evals + L,
            carry.probe_evals + probe_ev,
        )
        return out, jnp.mean(accept_prob)

    @jax.jit
    def _chunk(carry, flags):
        return lax.scan(one_step, carry, flags)

    carry = _init(state)
    accepts = []
    if cfg.leapfrogs_per_program > 0:
        # Chunked warmup (mirrors make_chunked_step for the sampling
        # phase): the remote worker kills device programs over ~1 min, and
        # a whole-trajectory warmup program at production scale (chains x
        # max_leapfrogs x ms/grad) can exceed that with no mid-warmup
        # checkpoint to resume from. Split each warmup trajectory across
        # <=leapfrogs_per_program-step programs; the adaptation tail runs
        # as its own (cheap) program. Identical math to the monolithic
        # path — same Halton jitter, RNG stream, DA/Adam/Welford updates —
        # only the program boundaries differ (parity-tested in
        # tests/test_chees.py).
        chunk = int(cfg.leapfrogs_per_program)
        if cfg.chain_exec == "vmap":
            step_all = lambda s, eps, im: jax.vmap(
                lambda si: leapfrog(pg, si, eps, im)
            )(s)
        else:
            step_all = lambda s, eps, im: lax.map(
                lambda si: leapfrog(pg, si, eps, im), s
            )

        @jax.jit
        def _wstart(carry: _WarmupCarry):
            state = carry.state._replace(
                step_size=jnp.exp(carry.da.log_step),
                traj_len=jnp.exp(carry.log_T),
            )
            h = halton(state.iteration)
            L = jnp.ceil(h * state.traj_len / state.step_size).astype(jnp.int32)
            L = jnp.clip(
                L, max(1, cfg.min_leapfrogs),
                cfg.warmup_max_leapfrogs or cfg.max_leapfrogs,
            )
            keys = jax.vmap(jax.random.split)(state.key)
            k_mom, k_next = keys[:, 0], keys[:, 1]
            r0 = jax.vmap(
                lambda k, q: jax.random.normal(k, q.shape)
                / jnp.sqrt(state.inv_mass)
            )(k_mom, state.q)
            H0 = state.U + kinetic(r0, state.inv_mass[None, :])
            s0 = LeapfrogState(state.q, r0, state.U, state.grad)
            return s0, H0, k_next, L, h, state.step_size, state.inv_mass

        @jax.jit
        def _wseg(s, step_size, inv_mass, n):
            return lax.fori_loop(
                0, n, lambda i, si: step_all(si, step_size, inv_mass), s
            )

        @jax.jit
        def _wtail(carry, flags, traj):
            return one_step(carry, flags, traj)

        for i in range(cfg.num_warmup):
            s1, H0, k_next, L, h, eps_i, im_i = _wstart(carry)
            L_host = int(L)  # one scalar transfer per warmup iteration
            done = 0
            while done < L_host:
                n = min(chunk, L_host - done)
                s1 = _wseg(s1, eps_i, im_i, n)
                done += n
            carry, acc = _wtail(
                carry,
                (jnp.asarray(is_slow_np[i]), jnp.asarray(wend_np[i])),
                (s1, H0, k_next, L, h),
            )
            accepts.append(np.asarray(acc)[None])
            if cfg.verbose:
                print(
                    f"chees warmup {i + 1}/{cfg.num_warmup}: eps="
                    f"{float(jnp.exp(carry.da.log_step_avg)):.3g} "
                    f"T={float(jnp.exp(carry.log_T)):.3g} "
                    f"L={L_host} "
                    f"accept={float(np.asarray(acc)):.2f}"
                )
        final = carry.state._replace(
            step_size=jnp.exp(carry.da.log_step_avg),
            traj_len=jnp.exp(carry.log_T),
        )
        info = {
            "accept_prob": np.concatenate(accepts) if accepts else np.zeros(0),
            "step_size": float(final.step_size),
            "traj_len": float(final.traj_len),
            "num_grad_evals": int(carry.n_evals) * state.q.shape[0]
            + int(carry.probe_evals),
        }
        return final, info

    spp = max(1, cfg.steps_per_program)
    for lo in range(0, cfg.num_warmup, spp):
        hi = min(lo + spp, cfg.num_warmup)
        flags = (
            jnp.asarray(is_slow_np[lo:hi]),
            jnp.asarray(wend_np[lo:hi]),
        )
        carry, acc = _chunk(carry, flags)
        accepts.append(np.asarray(acc))
        if cfg.verbose:
            print(
                f"chees warmup {hi}/{cfg.num_warmup}: eps="
                f"{float(jnp.exp(carry.da.log_step_avg)):.3g} "
                f"T={float(jnp.exp(carry.log_T)):.3g} "
                f"accept={float(acc.mean()):.2f}"
            )

    final = carry.state._replace(
        step_size=jnp.exp(carry.da.log_step_avg),
        traj_len=jnp.exp(carry.log_T),
    )
    info = {
        "accept_prob": np.concatenate(accepts) if accepts else np.zeros(0),
        "step_size": float(final.step_size),
        "traj_len": float(final.traj_len),
        # leapfrogs are per-chain lockstep (x C); step-size probes run on a
        # single chain (counted once) — ADVICE r2: don't undercount probes
        "num_grad_evals": int(carry.n_evals) * state.q.shape[0]
        + int(carry.probe_evals),
    }
    return final, info


def chees_sample(
    potential: Callable,
    state: ChEESState,
    cfg: ChEESConfig,
    fast_potential: Callable = None,
    timings: list = None,
) -> tuple[ChEESState, jnp.ndarray, dict]:
    """Draw ``cfg.num_samples`` per chain; returns (state, samples, info).

    With ``cfg.thin_draws == 1`` (default), ``samples`` is the full
    (draws, chains, dim) trace. With ``thin_draws > 1``, ``samples`` keeps
    one full position per ``thin_draws`` draws (chunk-granular) and info
    carries per-draw scalar traces instead: ``energy`` (exact potential at
    each draw, (draws, chains)) and ``q8`` (first <=8 coordinates,
    (draws, chains, k)) — the standard diagnostic projections — so
    R-hat/ESS lose nothing while device->host traffic drops by
    ~dim/8/thin_draws. ``info["kept_idx"]`` gives the draw index of each
    kept position.

    ``timings``: optional list; each chunk appends ``(n_draws, wall_s)``
    (device-synced) — chunk 0 includes compile."""
    import time as _time

    pg, exact_U = _exact_and_fast(potential, fast_potential, cfg.chain_exec)
    k8 = min(8, state.q.shape[-1])
    lean = cfg.thin_draws > 1

    if cfg.leapfrogs_per_program > 0:
        return _chees_sample_chunked(pg, exact_U, state, cfg, timings)

    def one(carry, _):
        new_state, info = chees_step(pg, carry, cfg, exact_U)
        if lean:
            out = (
                new_state.U,
                new_state.q[:, :k8],
                info.accept_prob,
                info.num_leapfrogs,
            )
        else:
            out = (new_state.q, info.accept_prob, info.num_leapfrogs)
        return new_state, out

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def _chunk(state, n):
        return lax.scan(one, state, None, length=n)

    qs, accs, Ls, Us, q8s, kept = [], [], [], [], [], []
    spp = max(1, cfg.steps_per_program)
    done = 0
    next_keep = cfg.thin_draws
    while done < cfg.num_samples:
        n = min(spp, cfg.num_samples - done)
        _t0 = _time.time()
        state, out = _chunk(state, n)
        if timings is not None:
            jax.block_until_ready(out[0])
            timings.append((n, _time.time() - _t0))
        done += n
        if lean:
            U, q8, a, L = out
            Us.append(np.asarray(U))
            q8s.append(np.asarray(q8))
            # keep the chunk-final full position when a keep boundary was
            # crossed: one 76 MB transfer per thin_draws draws, not per draw
            if done >= next_keep:
                qs.append(np.asarray(state.q))
                kept.append(done - 1)
                # advance past *every* boundary this chunk crossed: with
                # steps_per_program > thin_draws only the chunk-final
                # position exists to keep, and bumping by a single
                # thin_draws would let next_keep lag behind done so the
                # keep schedule silently drifts to once-per-chunk while
                # the metadata still claims thin_draws spacing
                next_keep = (done // cfg.thin_draws + 1) * cfg.thin_draws
        else:
            q, a, L = out
            qs.append(np.asarray(q))
        accs.append(np.asarray(a))
        Ls.append(np.asarray(L))
        if cfg.verbose:
            print(f"chees sampling {done}/{cfg.num_samples}", flush=True)

    if lean:
        samples = (
            np.stack(qs) if qs else np.zeros((0,) + state.q.shape)
        )  # (kept, chains, dim)
    else:
        samples = np.concatenate(qs) if qs else np.zeros((0,) + state.q.shape)
    info = {
        "accept_prob": np.concatenate(accs) if accs else np.zeros(0),
        "num_leapfrogs": np.concatenate(Ls) if Ls else np.zeros(0, np.int32),
        "num_grad_evals": int(np.sum(np.concatenate(Ls))) * state.q.shape[0]
        if Ls
        else 0,
    }
    if lean:
        info["energy"] = (
            np.concatenate(Us) if Us else np.zeros((0, state.q.shape[0]))
        )
        info["q8"] = (
            np.concatenate(q8s)
            if q8s
            else np.zeros((0, state.q.shape[0], k8))
        )
        info["kept_idx"] = np.asarray(kept, np.int64)
    # host (numpy) samples: re-materializing the full (draws, chains, dim)
    # posterior on device is 15+ GB at the 4-param production scale (100
    # draws x 2 chains x 19M weights) — more than the chip's HBM. Draws
    # stream back to the device in chunks wherever they are consumed
    # (posterior_params, _loglik_of_draws).
    return state, samples, info


def _chees_sample_chunked(pg, exact_U, state, cfg, timings=None):
    """Sampling loop for ``cfg.leapfrogs_per_program > 0``: the host
    sequences one :func:`make_chunked_step` transition per draw (each a
    handful of watchdog-safe device programs), with the same lean
    thinning and info contract as the scanned path. Draw granularity is
    1, so thin boundaries land exactly on ``thin_draws`` multiples."""
    import time as _time

    k8 = min(8, state.q.shape[-1])
    lean = cfg.thin_draws > 1
    step = make_chunked_step(pg, cfg, exact_U)

    qs, accs, Ls, Us, q8s, kept = [], [], [], [], [], []
    for done in range(1, cfg.num_samples + 1):
        _t0 = _time.time()
        state, info = step(state)
        if timings is not None:
            jax.block_until_ready(state.q)
            timings.append((1, _time.time() - _t0))
        accs.append(np.asarray(info.accept_prob)[None])
        Ls.append(np.asarray(info.num_leapfrogs)[None])
        if lean:
            Us.append(np.asarray(state.U)[None])
            q8s.append(np.asarray(state.q[:, :k8])[None])
            if done % cfg.thin_draws == 0:
                qs.append(np.asarray(state.q))
                kept.append(done - 1)
        else:
            qs.append(np.asarray(state.q)[None])
        if cfg.verbose:
            print(f"chees sampling {done}/{cfg.num_samples}", flush=True)

    if lean:
        samples = np.stack(qs) if qs else np.zeros((0,) + state.q.shape)
    else:
        samples = np.concatenate(qs) if qs else np.zeros((0,) + state.q.shape)
    info_out = {
        "accept_prob": np.concatenate(accs) if accs else np.zeros(0),
        "num_leapfrogs": np.concatenate(Ls) if Ls else np.zeros(0, np.int32),
        "num_grad_evals": int(np.sum(np.concatenate(Ls))) * state.q.shape[0]
        if Ls
        else 0,
    }
    if lean:
        info_out["energy"] = (
            np.concatenate(Us) if Us else np.zeros((0, state.q.shape[0]))
        )
        info_out["q8"] = (
            np.concatenate(q8s) if q8s else np.zeros((0, state.q.shape[0], k8))
        )
        info_out["kept_idx"] = np.asarray(kept, np.int64)
    return state, samples, info_out


def run_chees(
    potential: Callable,
    q0: jnp.ndarray,
    cfg: ChEESConfig = ChEESConfig(),
    fast_potential: Callable = None,
    init_inv_mass: jnp.ndarray = None,
) -> dict:
    """Warmup + sample. ``q0``: (chains, dim). Returns a dict with
    ``samples`` (draws, chains, dim) and adaptation/throughput info.

    Mixed precision: pass the f32 potential as ``potential`` and a cheap
    deterministic approximation (bf16-compute flow) as ``fast_potential``
    — leapfrog gradients run fast, accept energies stay exact, and the
    stationary distribution is exactly ``exp(-potential)``."""
    state = chees_init(potential, q0, cfg, fast_potential, init_inv_mass)
    state, winfo = chees_warmup(potential, state, cfg, fast_potential)
    state, samples, sinfo = chees_sample(potential, state, cfg, fast_potential)
    return {
        "samples": samples,
        "warmup": winfo,
        "sampling": sinfo,
        "step_size": float(state.step_size),
        "traj_len": float(state.traj_len),
        "inv_mass": np.asarray(state.inv_mass),
    }


def posterior_batch_files(checkpoint_dir: str) -> list:
    """Sorted per-batch posterior files written by the checkpointed
    drivers (``posterior_batch_*.npz``), preceded by a legacy single-file
    ``posterior.npz`` if one exists (resume compatibility with runs
    started before the per-batch layout)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(checkpoint_dir, "posterior_batch_*.npz")))
    legacy = os.path.join(checkpoint_dir, "posterior.npz")
    if os.path.exists(legacy):
        files = [legacy] + files
    return files


def run_chees_checkpointed(
    potential: Callable,
    q0: jnp.ndarray,
    cfg: ChEESConfig,
    checkpoint_dir: str,
    nbatch: int = 100,
    fast_potential: Callable = None,
    callback=None,
    init_inv_mass: jnp.ndarray = None,
    assemble: bool = True,
    potential_tag: str = "centered",
    place: Callable = None,
) -> dict:
    """Elastic checkpointed ChEES sampling (the reference's
    ``train_bayesian_flow`` semantics, ``bflow_jax_maf.py:355-404``, for
    this kernel): warm up once, then draw ``nbatch`` per round, each round
    landing on disk as its own ``posterior_batch_NNNNN.npz`` until
    ``cfg.num_samples`` per chain are collected. A killed run resumes from
    the last completed round — the full sampler state (positions,
    per-chain RNG keys, step size, trajectory length, mass, Halton
    counter) round-trips through pytree .npz files, so the resumed stream
    is identical to an uninterrupted run.

    Per-batch files (not one growing ``posterior.npz``) keep the disk and
    RAM cost O(nbatch) per round: at the 4-param production scale the
    posterior is tens of GB, and rewriting an accumulated archive every
    round is quadratic I/O (measured: dominated round-2's run tail).

    Returns ``{"q": (total, chains, dim), ...}`` as numpy arrays plus the
    adaptation diagnostics (``step_size``, ``traj_len``, ``inv_mass``,
    ``warmup_num_grad_evals`` — persisted in the warmup checkpoint so a
    resumed run reports them instead of NaNs). With ``assemble=False``
    the returned dict has ``batch_files`` (paths, draw-ordered) instead of
    ``q`` — callers stream batches (``naz_tpu.bayes.exact`` does) instead
    of materializing a production posterior in host RAM.

    ``place``: optional ``state -> state`` placement hook (e.g.
    ``lambda s: shard_chees_state(s, mesh)``) applied to the freshly
    initialized AND the checkpoint-loaded state — checkpoints round-trip
    through host numpy, so without re-placement a resumed multi-chip run
    silently degrades to replicated execution."""
    import json
    import os
    import warnings

    from naz_tpu.io.checkpoint import load_pytree, save_pytree

    os.makedirs(checkpoint_dir, exist_ok=True)
    state_file = os.path.join(checkpoint_dir, "chees_state.npz")
    warmup_file = os.path.join(checkpoint_dir, "warmup.json")

    if cfg.thin_draws > 1 and cfg.thin_draws > nbatch:
        raise ValueError(
            f"thin_draws={cfg.thin_draws} > nbatch={nbatch}: each round "
            "draws nbatch samples per chain and keeps positions only at "
            "thin_draws boundaries, so no position would ever be kept "
            "(an empty posterior). Lower --thin-draws or raise --nbatch."
        )

    if os.path.exists(state_file):
        # resume: build a zero-cost template with the right shapes instead
        # of evaluating the potential — chees_init vmaps the (possibly
        # Pallas) potential over chains, which at production scale costs a
        # multi-minute compile (and a batched kernel the VMEM budget may
        # not even admit) only to be overwritten by the loaded state
        _check_chain_count(q0.shape[0])
        template = ChEESState(
            q=q0,
            U=jnp.zeros((q0.shape[0],), q0.dtype),
            grad=jnp.zeros_like(q0),
            key=jax.random.split(jax.random.PRNGKey(cfg.seed), q0.shape[0]),
            step_size=jnp.zeros((), q0.dtype),
            traj_len=jnp.zeros((), q0.dtype),
            inv_mass=jnp.ones((q0.shape[-1],), q0.dtype),
            iteration=jnp.zeros((), jnp.int32),
        )
        state = load_pytree(state_file, template)
        if place is not None:
            state = place(state)
        winfo = {"num_grad_evals": 0, "step_size": float("nan"),
                 "traj_len": float("nan")}
        if os.path.exists(warmup_file):
            with open(warmup_file) as f:
                winfo = json.load(f)
        # potential-convention stamp (ADVICE r3): the stored state.U was
        # computed under a specific potential convention (e.g. the
        # centered potential, offset by -P*log2 from the uncentered one).
        # Resuming under a *different* convention makes the first
        # post-resume Metropolis delta wrong by that offset per chain —
        # a silently biased (force-accepted or force-rejected) step.
        stored_tag = winfo.get("potential")
        if stored_tag is None:
            warnings.warn(
                f"checkpoint {checkpoint_dir} predates the potential-"
                f"convention stamp; assuming it matches the current "
                f"'{potential_tag}' convention. If this checkpoint was "
                "written before the centered-potential change, delete it "
                "and re-warm instead of resuming.",
                stacklevel=2,
            )
        elif stored_tag != potential_tag:
            raise ValueError(
                f"checkpoint {checkpoint_dir} was written under potential "
                f"convention '{stored_tag}' but this run uses "
                f"'{potential_tag}': the stored chain energies are offset "
                "and the first resumed transition per chain would bypass "
                "the MH correction. Re-warm in a fresh checkpoint dir."
            )
    else:
        state = chees_init(potential, q0, cfg, fast_potential, init_inv_mass)
        if place is not None:
            state = place(state)
        state, winfo = chees_warmup(potential, state, cfg, fast_potential)
        winfo = {
            "num_grad_evals": int(winfo["num_grad_evals"]),
            "step_size": float(winfo["step_size"]),
            "traj_len": float(winfo["traj_len"]),
            "potential": potential_tag,
        }
        save_pytree(state_file, state)
        with open(warmup_file, "w") as f:
            json.dump(winfo, f)

    def _counts():
        files = posterior_batch_files(checkpoint_dir)
        n = 0
        for f in files:
            with np.load(f) as z:
                n += z["accept_prob"].shape[0]
        return files, n

    files, collected = _counts()
    next_index = len(files)
    while collected < cfg.num_samples:
        n = min(nbatch, cfg.num_samples - collected)
        batch_cfg = dataclasses.replace(cfg, num_samples=n)
        state, q, info = chees_sample(potential, state, batch_cfg, fast_potential)
        # state first, then the batch file: a crash between the writes
        # loses at most one batch of draws, never double-counts
        save_pytree(state_file, state)
        batch_file = os.path.join(
            checkpoint_dir, f"posterior_batch_{next_index:05d}.npz"
        )
        extra = {}
        if cfg.thin_draws > 1:
            # lean sampling: q holds only the kept positions; per-draw
            # scalar traces (exact energy, first-8 coords) ride alongside
            extra = {
                "energy": np.asarray(info["energy"]),
                "q8": np.asarray(info["q8"]),
                "kept_idx": np.asarray(info["kept_idx"]),  # batch-relative
            }
        np.savez(
            batch_file,
            q=np.asarray(q),
            accept_prob=np.asarray(info["accept_prob"]),
            num_leapfrogs=np.asarray(info["num_leapfrogs"]),
            **extra,
        )
        next_index += 1
        collected += n
        if callback is not None:
            callback(collected, batch_file)

    files, collected = _counts()
    small = {"accept_prob": [], "num_leapfrogs": []}
    if files:
        with np.load(files[0]) as z0:
            if "energy" in z0.files:
                small.update(energy=[], q8=[])
    kept_global, offset = [], 0
    for f in files:
        with np.load(f) as z:
            for k in small:
                small[k].append(z[k])
            # batch files store kept_idx batch-relative; rebase to the
            # global draw index so consumers can align kept positions
            # with the per-draw scalar traces
            if "kept_idx" in z.files:
                kept_global.append(np.asarray(z["kept_idx"]) + offset)
            offset += z["accept_prob"].shape[0]
    posterior = {
        k: (np.concatenate(v, axis=0) if v else np.zeros((0,)))
        for k, v in small.items()
    }
    if kept_global:
        posterior["kept_idx"] = np.concatenate(kept_global)
    if assemble:
        posterior["q"] = np.concatenate(
            [np.load(f)["q"] for f in files], axis=0
        )
    else:
        posterior["batch_files"] = files
        posterior["num_draws"] = collected
    posterior["warmup_num_grad_evals"] = np.asarray(winfo["num_grad_evals"])
    posterior["step_size"] = np.asarray(float(state.step_size))
    posterior["traj_len"] = np.asarray(float(state.traj_len))
    posterior["inv_mass"] = np.asarray(state.inv_mass)
    return posterior

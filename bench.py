"""Benchmark: leapfrog grad-evals/s/chip on the 2506.05657 workload.

The north-star metric (BASELINE.md): one "grad eval" = one
value_and_grad of the full Bayesian-flow potential — the complete
training-set log-likelihood (N=190,000 points, the reference's 1.9e5
training-set size) through the conditional MAF 16 layers x hidden
[150,150,150] (examples/papers/2506.05657/hmc_maf_exact.py:101) plus the
prior reparameterization — i.e. exactly the inner loop of NUTS/ChEES.

Production configuration measured here: ``compute_dtype="bfloat16"``
(conditioner activations in bf16 — the hot path is HBM-bandwidth-bound,
so halving activation bytes is ~1.9x; see PERFORMANCE.md). Used for
leapfrog gradients with exact f32 accept energies (``--kernel chees``
mixed precision), this does not perturb the posterior.

Methodology: the remote-tunnel dispatch overhead of a jitted program is
large and highly variable (25-400 ms), so the rate is taken from the
SLOPE between two in-program iteration counts — fixed overhead cancels.
Each iteration's position depends on the previous gradient, so no work
can be elided or cached.

Emits the headline JSON line LAST: {"metric", "value", "unit",
"vs_baseline"} plus roofline-accounting keys ("effective_tflops",
"pct_of_hbm_roofline" — the naive per-op HBM traffic model documented in
PERFORMANCE.md; >100% means XLA's fusion beats the naive model, i.e. the
path is at the achievable bandwidth ceiling). A second JSON line for the
OTHER half of the BASELINE.json metric, post-warmup effective samples/s
at the same production config (ChEES kernel, bf16 gradients + exact f32
accept energies), is printed between a provisional early copy of the
headline and the canonical final headline line. The ESS phase is
budget-aware (BENCH_ESS_BUDGET_S, default 3000 s): it resumes from the
committed warmup checkpoint ``bench_assets/ess_warmup_state.npz`` when
present (skipping the ~950 s warmup) and refuses convergence extensions
that would overrun the budget.

The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is 1.0 by convention.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


N_DATA = 190_000
ITERS_LO = 24
ITERS_HI = 120

# Analytic workload model for the flagship potential (16 layers, widths
# [4,150,150,150,4], N data points): matmul FLOPs per grad eval =
# fwd + remat-recompute + dX-grads + W-grads = 4x forward.
_MM_COLS = 4 * 150 + 150 * 150 + 150 * 150 + 150 * 4
FLOPS_PER_GRAD = 4 * 2 * N_DATA * _MM_COLS * 16


def wait_for_chip(max_wait_s=1800, poll_s=30):
    """Block until this process owns the TPU. Benchmarking while another
    process holds the chip poisons every number (round-2's bench overlapped
    a production run's tail: a 22 s compile line ballooned to 1136 s —
    PERFORMANCE.md "Wall-clock hygiene"). On this runtime a second process
    touching the device raises (FailedPrecondition) rather than timeshare,
    so "can we run one tiny op" is exactly "is the chip free"."""
    t0 = time.time()
    while True:
        try:
            # contention does not always raise — a co-resident process
            # timeshares and inflates dispatch latency by orders of
            # magnitude instead (round-2's symptom). Probe 3x, judge the
            # BEST latency against a generous tunnel-overhead budget.
            best = float("inf")
            for _ in range(3):
                t = time.time()
                jax.block_until_ready(jnp.zeros((8,)) + 1.0)
                best = min(best, time.time() - t)
            if best < 5.0:
                return
            reason = f"tiny-op latency {best:.1f}s"
        except Exception as e:
            reason = f"{type(e).__name__}: {e}"
        waited = time.time() - t0
        if waited > max_wait_s:
            raise RuntimeError(f"chip still busy after {waited:.0f}s: {reason}")
        print(
            f"bench: chip busy ({reason}), retrying in {poll_s}s",
            file=sys.stderr, flush=True,
        )
        time.sleep(poll_s)


def make_runner(n_iters, fwd_only=False, remat=True):
    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow

    key = jax.random.PRNGKey(0)
    lam = jax.random.uniform(key, (N_DATA, 2), minval=-1, maxval=1)
    theta = jnp.stack(
        [
            lam[:, 0] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (N_DATA,)),
            0.5 * lam[:, 1] + 0.2 * jax.random.normal(jax.random.PRNGKey(2), (N_DATA,)),
        ],
        -1,
    )

    flow = maf_flow(
        2, n_layers=16, hidden_dims=(150, 150, 150), context_dim=2, seed=0,
        compute_dtype="bfloat16", remat=remat,
    )
    params = flow.init_params(jax.random.PRNGKey(3))
    bf = BayesianFlow(make_flow_loglik(flow, theta, lam), params, scale_max=0.01)
    pg = jax.value_and_grad(bf.potential)
    q0 = bf.init_positions(jax.random.PRNGKey(4), 1, jitter=0.01)[0]

    @jax.jit
    def run(q, eps):
        def body(carry, _):
            q, acc = carry
            if fwd_only:
                U = bf.potential(q)
                return (q + (eps * 1e-8) * U, acc + U), None
            U, g = pg(q)
            return (q + eps * g, acc + U), None

        (qf, acc), _ = jax.lax.scan(body, (q, 0.0), None, length=n_iters)
        return acc

    return run, q0


def timed(n_iters, fwd_only=False, remat=True):
    run, q0 = make_runner(n_iters, fwd_only, remat=remat)
    t0 = time.time()
    acc = float(run(q0, 1e-12))  # compile + warm
    print(
        f"iters={n_iters}{' (fwd)' if fwd_only else ''}"
        f"{'' if remat else ' (no-remat)'}: "
        f"compile+run {time.time()-t0:.0f}s",
        flush=True,
    )
    best = float("inf")
    for r in range(3):
        t0 = time.time()
        acc = float(run(q0, 1e-12 * (1 + r)))
        best = min(best, time.time() - t0)
    return best


def bench_ess(num_warmup=1000, num_samples=1000, num_chains=4,
              warm_ckpt="bench_assets/ess_warmup_state.npz",
              budget_s=None):
    """Post-warmup ESS_min/s at the production config: ChEES with bf16
    leapfrog gradients and exact f32 accept energies (the production
    recommendation). Timing from the sampling-phase chunk wall clocks,
    excluding the compile chunk (slope methodology at the chunk level).
    ESS over the standard diagnostic projection (log-likelihood trace +
    first 8 coordinates), min across the projection.

    Statistical validity gate (VERDICT r2, tightened r4): the full
    publication budget (4 chains x 1000 draws after a real 1000-step
    warmup — the recipe that converged the production posterior), split
    R-hat reported alongside, and the line is REFUSED (stderr, no JSON)
    if R-hat_max > 1.01 — the converged production run's standard
    (PERFORMANCE.md: 1.0088). An ESS estimated from unmixed chains is
    garbage and must not land in BENCH_r{N}.json."""
    import numpy as np

    from naz_tpu.bayes import BayesianFlow, make_flow_loglik
    from naz_tpu.flows import maf_flow
    from naz_tpu.mcmc.chees import (
        ChEESConfig, chees_init, chees_sample, chees_warmup,
    )
    from naz_tpu.mcmc.diagnostics import effective_sample_size, split_rhat

    key = jax.random.PRNGKey(0)
    lam = jax.random.uniform(key, (N_DATA, 2), minval=-1, maxval=1)
    theta = jnp.stack(
        [
            lam[:, 0] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (N_DATA,)),
            0.5 * lam[:, 1] + 0.2 * jax.random.normal(jax.random.PRNGKey(2), (N_DATA,)),
        ],
        -1,
    )
    kw = dict(n_layers=16, hidden_dims=(150, 150, 150), context_dim=2, seed=0)
    flow16 = maf_flow(2, compute_dtype="bfloat16", **kw)
    flow32 = maf_flow(2, **kw)
    params = flow32.init_params(jax.random.PRNGKey(3))
    bf32 = BayesianFlow(make_flow_loglik(flow32, theta, lam), params, scale_max=0.01)
    bf16 = BayesianFlow(make_flow_loglik(flow16, theta, lam), params, scale_max=0.01)

    cfg = ChEESConfig(
        num_warmup=num_warmup, num_samples=num_samples,
        num_chains=num_chains, seed=0, chain_exec="map",
        # program-runtime bound: the remote worker kills long device
        # programs; keep steps x chains x max_leapfrogs x ms/grad under
        # ~1 min (8 x 4 x 64 x 26 ms ~ 53 s)
        steps_per_program=8, max_leapfrogs=64,
        # lean sampling: per-draw scalar traces (exact energy + first-8
        # coords) feed the ESS/R-hat below; full 2.98 MB position vectors
        # stream only every 25th draw, so the bench measures the sampler,
        # not the remote tunnel's device->host bandwidth
        thin_draws=25,
    )
    import os

    from naz_tpu.io.checkpoint import load_pytree, save_pytree

    if budget_s is None:
        # 3000 s keeps the worst case (no warm asset: ~950 s warmup +
        # 1000 draws + one extension) inside a 1 h driver wall budget
        # with the ~2 min grad-evals phase in front (BENCH_r04 rc=124)
        budget_s = float(os.environ.get("BENCH_ESS_BUDGET_S", "3000"))
    t_bench = time.time()
    q0 = bf32.init_positions(jax.random.PRNGKey(4), num_chains, jitter=0.01)
    t0 = time.time()
    state = chees_init(bf32.potential_centered, q0, cfg, bf16.potential_centered)
    if os.path.exists(warm_ckpt):
        # budget-aware path (VERDICT r4): the warmup for this EXACT config
        # (seeded data, seeded init, fixed flow) is deterministic given the
        # committed asset; resuming from it spends the driver's budget on
        # the thing being measured — post-warmup sampling — instead of
        # re-paying the ~950 s warmup every round. The asset is produced by
        # the else-branch below (one real on-chip warmup) and committed.
        state = load_pytree(warm_ckpt, state)
        print(
            f"ess-bench: warm-started from {warm_ckpt} "
            f"(eps={float(state.step_size):.3g} "
            f"T={float(state.traj_len):.3g}); warmup skipped", flush=True,
        )
    else:
        state, winfo = chees_warmup(
            bf32.potential_centered, state, cfg, bf16.potential_centered
        )
        print(f"ess-bench warmup: {time.time()-t0:.0f}s, "
              f"eps={winfo['step_size']:.3g} T={winfo['traj_len']:.3g}",
              flush=True)
        os.makedirs(os.path.dirname(warm_ckpt) or ".", exist_ok=True)
        save_pytree(warm_ckpt, state)
        print(f"ess-bench: saved warmup state to {warm_ckpt}", flush=True)
    import dataclasses

    timings = []
    state, samples, sinfo = chees_sample(
        bf32.potential_centered, state, cfg, bf16.potential_centered, timings=timings
    )
    energy, q8, n_leap = sinfo["energy"], sinfo["q8"], sinfo["num_leapfrogs"]

    def _diag():
        diag = np.concatenate([energy[..., None], q8], axis=-1)
        return (
            np.asarray(effective_sample_size(diag)),
            np.asarray(split_rhat(diag)),
        )

    ess, rhat = _diag()
    # adaptive continuation: a near-miss of the 1.01 gate is cured by more
    # draws, not by discarding the run — extend (still timed; the chains
    # keep their state) before refusing
    extensions = 0
    while float(rhat.max()) > 1.01 and extensions < 2:
        # budget gate: an extension that would blow the driver's wall
        # budget (BENCH_r04 died at rc=124 exactly this way) is refused
        # up front — better a loud refusal than a silent timeout with no
        # ESS line at all
        wall_so_far = sum(t for _, t in timings)
        draws_so_far = sum(n for n, _ in timings)
        est_ext = 500 * wall_so_far / max(1, draws_so_far)
        if time.time() - t_bench + est_ext > budget_s:
            print(
                f"ess-bench: extension (~{est_ext:.0f}s) would exceed the "
                f"{budget_s:.0f}s budget ({time.time()-t_bench:.0f}s "
                "elapsed); stopping extensions", flush=True,
            )
            break
        extensions += 1
        print(
            f"ess-bench split-Rhat {float(rhat.max()):.4f} > 1.01: "
            f"extending by 500 draws (extension {extensions}/2)", flush=True,
        )
        ext_cfg = dataclasses.replace(cfg, num_samples=500)
        state, _, extinfo = chees_sample(
            bf32.potential_centered, state, ext_cfg, bf16.potential_centered,
            timings=timings,
        )
        energy = np.concatenate([energy, extinfo["energy"]])
        q8 = np.concatenate([q8, extinfo["q8"]])
        n_leap = np.concatenate([n_leap, extinfo["num_leapfrogs"]])
        ess, rhat = _diag()

    # drop the compile chunk, rate from the steady-state chunks
    steady = timings[1:] if len(timings) > 1 else timings
    wall = sum(t for _, t in steady)
    n_draws = sum(n for n, _ in steady)
    frac = n_draws / max(1, sum(n for n, _ in timings))
    num_samples = energy.shape[0]
    sinfo = {"num_grad_evals": int(np.sum(n_leap)) * num_chains}

    if float(rhat.max()) > 1.01:
        raise RuntimeError(
            f"ess bench not converged (split-Rhat max {float(rhat.max()):.4f} "
            f"> 1.01 after {num_samples} draws/chain); refusing to report "
            "an ESS rate from unmixed chains"
        )
    # scale ESS to the draws actually timed in the steady-state window
    ess_min_per_s = float(ess.min() * frac / wall)
    grads_per_s = sinfo["num_grad_evals"] * frac / wall
    return {
        "metric": "ess_min_per_s",
        "value": round(ess_min_per_s, 3),
        "unit": (
            "min-ESS/s post-warmup (ChEES mixed-precision, 16x[150]^3, "
            f"N=190k, {num_chains} chains, {num_samples} draws/chain)"
        ),
        "vs_baseline": 1.0,
        "ess_min": round(float(ess.min()), 1),
        "ess_median": round(float(np.median(ess)), 1),
        "split_rhat_max": round(float(rhat.max()), 4),
        "grads_per_s": round(float(grads_per_s), 1),
        "step_size": round(float(state.step_size), 5),
        "traj_len": round(float(state.traj_len), 4),
    }


def main():
    wait_for_chip()
    t_lo = timed(ITERS_LO)
    t_hi = timed(ITERS_HI)
    per_eval = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    evals_per_s = 1.0 / per_eval

    # self-calibrated composite bound: the backward+remat computes 3x the
    # forward's matmul FLOPs at no better arithmetic intensity, so a grad
    # eval cannot beat 4x the measured forward slope on the same machine
    # (per-op account: PERFORMANCE.md "Roofline accounting").
    tf_lo = timed(ITERS_LO, fwd_only=True)
    tf_hi = timed(ITERS_HI, fwd_only=True)
    per_fwd = (tf_hi - tf_lo) / (ITERS_HI - ITERS_LO)

    headline_dict = {
        "metric": "leapfrog_grad_evals_per_s_per_chip",
        "value": round(evals_per_s, 2),
        "unit": "grad-evals/s (16x[150]^3 MAF, N=190k, bf16-compute)",
        "vs_baseline": 1.0,
        "effective_tflops": round(FLOPS_PER_GRAD * evals_per_s / 1e12, 1),
        "fwd_ms": round(per_fwd * 1e3, 2),
        "pct_of_4xfwd_bound": round(100.0 * 4 * per_fwd / per_eval, 1),
    }
    headline = json.dumps(headline_dict)
    # the headline is complete at this point; land it BEFORE the
    # long-running ESS phase so an external timeout mid-ESS cannot leave
    # the bench with no JSON at all, and repeat it LAST (the driver
    # parses the final line as the headline metric). The early copy is
    # tagged provisional so line-aggregating consumers don't double-count.
    print(json.dumps({**headline_dict, "provisional": True}), flush=True)

    try:
        ess_line = bench_ess()
        print(json.dumps(ess_line))
    except Exception as e:  # ESS line is best-effort; headline must land
        print(f"ess bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(headline)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

"""Exact-Bayesian flow training: NUTS over flow weights, end to end.

The analogue of the reference's production path
(``examples/papers/2506.05657/hmc_maf_exact.py:100-144`` driving
``train_bayesian_flow_hmc`` / checkpointed ``train_bayesian_flow``,
``bflow_jax_maf.py:321-404``) — MLE params in, posterior over weights out,
with chains vmapped on-device and optional elastic checkpoint/resume.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes.wrapper import BayesianFlow
from naz_tpu.mcmc.diagnostics import effective_sample_size, split_rhat
from naz_tpu.mcmc.run import MCMCRunConfig, run_nuts, run_nuts_checkpointed


def _loglik_of_draws(bayes_flow, u, chunk: int = None):
    """Per-draw data log-likelihood, computed device-side straight from the
    unconstrained draws (no host round-trip of the flat weights — at
    production scale those are gigabytes over a remote tunnel). Chunked: a
    vmap over all draws would materialize (draws x N x hidden) activations
    and blow HBM at reference scale. The default chunk scales inversely
    with model complexity: 8 draws at the 2-D production shape (746k
    weights), 1 at the 4-param shape (19M weights, where even one draw's
    full-batch activations are GBs)."""
    if chunk is None:
        chunk = int(max(1, min(8, 6_000_000 // max(1, bayes_flow.complexity))))
    ll_fn = jax.jit(
        jax.vmap(
            lambda uu: bayes_flow.log_likelihood_flat(
                bayes_flow.constrain(uu)["params_flat"]
            )
        )
    )
    # keep the draws host-side (numpy): the full posterior is 15+ GB at the
    # 4-param production scale; only a chunk at a time touches the device
    u2 = np.asarray(u).reshape(-1, u.shape[-1])
    lls = []
    for s in range(0, u2.shape[0], chunk):
        lls.append(np.asarray(ll_fn(jnp.asarray(u2[s : s + chunk]))))
    return np.concatenate(lls).reshape(u.shape[:-1])


def _streamed_posterior(bayes_flow, u_batches, out_thin: int, lean: bool):
    """Common post-processing over a stream of ``(n, chains, dim)`` draw
    batches: full-trace log-likelihood + first-weight-coordinate
    diagnostics, constrained outputs on every ``out_thin``-th draw only.

    At production scale the posterior lives on disk as per-batch files
    (tens of GB); this never materializes more than one batch of
    unconstrained draws plus the thinned constrained outputs.
    """
    lls, diags, u_thin = [], [], []
    seen = 0
    for u in u_batches:
        u = np.asarray(u)
        lls.append(_loglik_of_draws(bayes_flow, u))
        diags.append(u[..., : min(8, u.shape[-1])])
        idx = [i for i in range(u.shape[0]) if (seen + i) % out_thin == 0]
        u_thin.append(u[idx])
        seen += u.shape[0]
    ll = np.concatenate(lls)
    u_diag = np.concatenate(diags)
    u_thin = np.concatenate(u_thin)

    out = bayes_flow.posterior_params(u_thin, lean=lean)
    # contract (ADVICE r3): log_likelihood rows align 1:1 with
    # params_flat rows in BOTH posterior modes; the full per-draw trace
    # stays available under log_likelihood_trace for diagnostics
    out["log_likelihood"] = ll[::out_thin]
    out["log_likelihood_trace"] = ll
    out["thin"] = out_thin
    diag_axis = np.concatenate([ll[..., None], u_diag], axis=-1)
    out["diagnostics"] = {
        "split_rhat": np.asarray(split_rhat(diag_axis)),
        "ess": np.asarray(effective_sample_size(diag_axis)),
    }
    return out


def _lean_posterior(
    bayes_flow, u_batches, energy, q8, thin_draws: int, out_thin: int,
    lean: bool, kept_idx=None,
):
    """Post-processing for lean (``thin_draws > 1``) sampling: the sampler
    already thinned positions on device and streamed per-draw scalar
    traces, so everything here is PURE HOST WORK — constrained outputs via
    the numpy constrain twin, and the kept draws' log-likelihoods
    recovered exactly from the identity

        energy = -(ll + log_det_centered + log_prior)

    (the sampler's exact accept-time energies). No draw crosses the
    tunnel again; the old device passes cost ~50 min per production
    posterior in transfers alone. ``u_batches`` yields
    ``(kept_positions, their_energies)`` per batch."""
    us, es = [], []
    seen = 0
    for u, e in u_batches:
        idx = [i for i in range(u.shape[0]) if (seen + i) % out_thin == 0]
        us.append(np.asarray(u)[idx])
        es.append(np.asarray(e)[idx])
        seen += u.shape[0]
    u_kept = np.concatenate(us)
    e_kept = np.concatenate(es)
    c = bayes_flow.constrain_host(u_kept, centered=True)
    # thin metadata derives from the actual kept-draw spacing (the real
    # cadence is max(thin_draws, steps_per_program), and the last batch
    # may keep nothing) rather than restating the config's request
    sel = None
    if kept_idx is not None and np.size(kept_idx):
        sel = np.asarray(kept_idx).reshape(-1)[::out_thin]
    if sel is not None and sel.size > 1:
        thin_actual = int(np.median(np.diff(sel)))
    else:
        thin_actual = thin_draws * out_thin
    out = {
        "scale": c["scale"],
        "params_flat": c["params_flat"],
        "thin": thin_actual,
        "energy": energy,
        "log_likelihood": -(e_kept + c["log_det"] + c["log_prior"]),
    }
    if sel is not None:
        # global draw index of each params_flat/log_likelihood row —
        # lets consumers align kept rows with the per-draw traces
        out["kept_idx"] = sel
    if not lean:
        out["standard"] = c["standard"]
        out["params"] = jax.vmap(jax.vmap(bayes_flow.unravel))(
            jnp.asarray(c["params_flat"])
        )
    diag_axis = np.concatenate([energy[..., None], q8], axis=-1)
    out["diagnostics"] = {
        "split_rhat": np.asarray(split_rhat(diag_axis)),
        "ess": np.asarray(effective_sample_size(diag_axis)),
    }
    return out


def _has_checkpoint(checkpoint_dir, state_name: str) -> bool:
    import os

    return checkpoint_dir is not None and os.path.exists(
        os.path.join(checkpoint_dir, state_name)
    )


def fit_nuts(
    bayes_flow: BayesianFlow,
    cfg: MCMCRunConfig = MCMCRunConfig(),
    checkpoint_dir: Optional[str] = None,
    nbatch: int = 100,
    init_jitter: float = 0.1,
    lean: bool = False,
    curvature_init_mass: bool = False,
    out_thin: int = 1,
) -> dict:
    """Sample the weight posterior with NUTS.

    Returns a posterior dict with constrained draws (``standard``, ``scale``,
    ``params_flat``, unraveled ``params``) of shape ``(num_samples,
    num_chains, ...)`` plus sampler statistics and summary diagnostics
    (split-R̂ / ESS on a diagnostic projection of the weight space and on the
    log-likelihood trace). ``lean=True`` skips the ``standard`` and
    unraveled ``params`` outputs (each another full-posterior copy of
    device->host traffic; the flat layout serves all downstream consumers).
    ``out_thin``: constrained outputs keep every ``out_thin``-th draw
    (diagnostics always use the full trace) — at production scale the full
    weight posterior is tens of GB and downstream consumers (calibration,
    BIC) subsample anyway.
    """
    q0 = bayes_flow.init_positions(
        jax.random.PRNGKey(cfg.seed + 1), cfg.num_chains, jitter=init_jitter
    )
    init_inv_mass = None
    if curvature_init_mass and not _has_checkpoint(checkpoint_dir, "mcmc_state.npz"):
        # on resume the checkpointed state (with its adapted mass) wins;
        # don't pay the probe compiles + gradient evals for a discarded init
        init_inv_mass = bayes_flow.curvature_inv_mass(
            jax.random.PRNGKey(cfg.seed + 2)
        )

    if checkpoint_dir is not None:
        posterior = run_nuts_checkpointed(
            bayes_flow.potential_centered, q0, cfg, checkpoint_dir,
            nbatch=nbatch, init_inv_mass=init_inv_mass, assemble=False,
        )
        lean_mode = posterior.get("energy") is not None

        def _pairs():
            for f in posterior["batch_files"]:
                with np.load(f) as z:
                    if lean_mode:
                        yield z["q"], z["energy"][z["kept_idx"]]
                    else:
                        yield z["q"], None

        u_batches = _pairs()
        energy = posterior.get("energy")
        q8 = posterior.get("q8")
        kept_idx = posterior.get("kept_idx")
        stats = {
            k: posterior[k] for k in ("accept_prob", "num_grad_evals", "diverging")
        }
        stats["warmup_grad_evals"] = int(posterior["warmup_num_grad_evals"])
    else:
        _, batch, winfo = run_nuts(
            bayes_flow.potential_centered, q0, cfg, init_inv_mass=init_inv_mass
        )
        if batch.energy is not None:
            u_batches = [
                (
                    np.asarray(batch.q),
                    np.asarray(batch.energy)[np.asarray(batch.kept_idx)],
                )
            ]
        else:
            u_batches = [(np.asarray(batch.q), None)]
        energy = batch.energy
        q8 = batch.q8
        kept_idx = batch.kept_idx
        stats = {
            "accept_prob": np.asarray(batch.accept_prob),
            "num_grad_evals": np.asarray(batch.num_grad_evals),
            "diverging": np.asarray(batch.diverging),
            "warmup_grad_evals": int(winfo.num_grad_evals),
        }

    if energy is not None:
        out = _lean_posterior(
            bayes_flow, u_batches, np.asarray(energy), np.asarray(q8),
            cfg.thin_draws, out_thin, lean, kept_idx=kept_idx,
        )
    else:
        out = _streamed_posterior(
            bayes_flow, (u for u, _ in u_batches), out_thin, lean
        )
    out["diagnostics"].update(
        divergence_fraction=float(np.mean(stats["diverging"])),
        mean_accept_prob=float(np.mean(stats["accept_prob"])),
        total_grad_evals=int(np.sum(stats["num_grad_evals"]))
        + stats["warmup_grad_evals"],
    )
    out["stats"] = stats
    return out


def fit_chees(
    bayes_flow: BayesianFlow,
    cfg=None,
    init_jitter: float = 0.1,
    fast_potential=None,
    checkpoint_dir: Optional[str] = None,
    nbatch: int = 100,
    lean: bool = False,
    curvature_init_mass: bool = False,
    out_thin: int = 1,
    warm_start: Optional[str] = None,
    warm_start_scale: float = 1.0,
) -> dict:
    """Sample the weight posterior with ChEES-HMC (cross-chain adaptive
    trajectory length; ``naz_tpu.mcmc.chees``). Same return layout as
    :func:`fit_nuts` (including ``out_thin`` thinning of the constrained
    outputs — diagnostics always use the full trace). Prefer this on TPU when running many chains: all
    chains integrate in lockstep (no per-chain tree divergence) and the
    tuned trajectory avoids NUTS's rejected-subtree gradient waste.

    ``curvature_init_mass``: initialize the diagonal mass from Hutchinson
    curvature probes at the MLE (``BayesianFlow.curvature_inv_mass``)
    instead of the identity — cuts the warmup spent discovering the MLE's
    local scales (warmup still adapts).

    ``warm_start``: path to a previous run's ChEES checkpoint (dir or
    ``chees_state.npz``); seeds eps/T/mass from its adapted state
    (``mcmc.chees.load_adaptation``) instead of identity-mass cold init.
    The warmup still probes and window-adapts, so the new posterior (e.g.
    an adjacent sigma0 in a prior-scale sweep) gets its own adaptation —
    just without re-paying the cold crawl. Takes precedence over
    ``curvature_init_mass``; ignored when resuming an existing
    checkpoint (the checkpoint's own state wins).

    ``warm_start_scale``: multiplier applied to the loaded inverse mass
    (per-coordinate posterior-variance estimate) and to the step size.
    Across a prior-scale change the standardized-space likelihood
    curvature scales as sigma0^2 (``params = mle*(1+scale*std)``: a std
    displacement moves params sigma0-proportionally), so
    likelihood-dominated coordinate variances scale as 1/sigma0^2 — pass
    ``(sigma_prev/sigma_new)**2``. Measured motivation: an UNSCALED
    sigma 0.01 -> 0.03 warm start on the production 2-D posterior still
    collapsed the probe to eps ~ 2e-4 (the 9x mass mismatch dominates),
    re-paying most of the cold crawl. Prior-dominated coordinates get an
    over-heavy mass from the rescale, which is the safe direction (probe
    + windows recover it)."""
    from naz_tpu.mcmc.chees import ChEESConfig, load_adaptation, run_chees

    from naz_tpu.mcmc.chees import run_chees_checkpointed

    cfg = cfg or ChEESConfig()
    q0 = bayes_flow.init_positions(
        jax.random.PRNGKey(cfg.seed + 1), cfg.num_chains, jitter=init_jitter
    )
    init_inv_mass = None
    if warm_start and not _has_checkpoint(checkpoint_dir, "chees_state.npz"):
        ws_mass, ws_eps, ws_T = load_adaptation(warm_start)
        if ws_mass.shape != (q0.shape[-1],):
            raise ValueError(
                f"warm-start mass has dim {ws_mass.shape} but this model "
                f"has {q0.shape[-1]} weights: {warm_start} is from a "
                "different architecture"
            )
        init_inv_mass = jnp.asarray(ws_mass, q0.dtype) * warm_start_scale
        # eps scales with the typical coordinate width ~ sqrt(variance)
        cfg = dataclasses.replace(
            cfg,
            init_step_size=ws_eps * float(np.sqrt(warm_start_scale)),
            init_traj_len=ws_T,
        )
    elif curvature_init_mass and not _has_checkpoint(checkpoint_dir, "chees_state.npz"):
        init_inv_mass = bayes_flow.curvature_inv_mass(
            jax.random.PRNGKey(cfg.seed + 2)
        )
    if checkpoint_dir is not None:
        posterior = run_chees_checkpointed(
            bayes_flow.potential_centered, q0, cfg, checkpoint_dir, nbatch=nbatch,
            fast_potential=fast_potential, init_inv_mass=init_inv_mass,
            assemble=False,
        )
        lean_mode = posterior.get("energy") is not None

        def _pairs():
            # per batch: (kept positions, their exact accept-time energies)
            for f in posterior["batch_files"]:
                with np.load(f) as z:
                    if lean_mode:
                        yield z["q"], z["energy"][z["kept_idx"]]
                    else:
                        yield z["q"], None

        u_batches = _pairs()
        res = {
            # adaptation diagnostics are persisted in the warmup checkpoint
            # (chees.py warmup.json + state file), so a resumed run reports
            # the real values rather than NaN/0
            "warmup": {"num_grad_evals": int(posterior["warmup_num_grad_evals"])},
            "sampling": {
                "accept_prob": posterior["accept_prob"],
                "num_leapfrogs": posterior["num_leapfrogs"],
                "num_grad_evals": int(np.sum(posterior["num_leapfrogs"]))
                * q0.shape[0],
                "energy": posterior.get("energy"),
                "q8": posterior.get("q8"),
                "kept_idx": posterior.get("kept_idx"),
            },
            "step_size": float(posterior["step_size"]),
            "traj_len": float(posterior["traj_len"]),
            "inv_mass": np.asarray(posterior["inv_mass"]),
        }
    else:
        res = run_chees(
            bayes_flow.potential_centered, q0, cfg, fast_potential=fast_potential,
            init_inv_mass=init_inv_mass,
        )
        sinfo = res["sampling"]
        if sinfo.get("energy") is not None:
            u_batches = [
                (
                    np.asarray(res["samples"]),
                    np.asarray(sinfo["energy"])[np.asarray(sinfo["kept_idx"])],
                )
            ]
        else:
            u_batches = [(np.asarray(res["samples"]), None)]

    if res["sampling"].get("energy") is not None:
        out = _lean_posterior(
            bayes_flow, u_batches, np.asarray(res["sampling"]["energy"]),
            np.asarray(res["sampling"]["q8"]), cfg.thin_draws, out_thin,
            lean, kept_idx=res["sampling"].get("kept_idx"),
        )
    else:
        out = _streamed_posterior(
            bayes_flow, (u for u, _ in u_batches), out_thin, lean
        )
    total_evals = int(res["warmup"]["num_grad_evals"]) + int(
        res["sampling"]["num_grad_evals"]
    )
    out["diagnostics"].update(
        divergence_fraction=0.0,
        mean_accept_prob=float(np.mean(res["sampling"]["accept_prob"])),
        total_grad_evals=total_evals,
        step_size=res["step_size"],
        traj_len=res["traj_len"],
    )
    out["stats"] = {
        "accept_prob": res["sampling"]["accept_prob"],
        "num_leapfrogs": res["sampling"]["num_leapfrogs"],
    }
    return out

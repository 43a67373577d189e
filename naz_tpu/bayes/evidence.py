"""Power-posterior evidence: stepping-stone + thermodynamic integration.

Beyond-reference model comparison. The reference estimates evidence by
importance sampling from the prior or an SVI guide
(``/root/reference/src/naz/trainers/train_flows.py:358-380``) and by BIC
(``bflow_jax_maf.py:474-475``); prior-proposal IS collapses (ESS -> 1) as
the posterior concentrates in P ~ 1e5-dimensional weight space. Power
posteriors bridge prior -> posterior through a temperature ladder
``p_beta(theta) ∝ L(theta)^beta pi(theta)`` and estimate log Z stably:

* **stepping stone** (Xie et al. 2011, Syst. Biol. 60:150): log Z =
  sum_k log E_{beta_k}[L^{beta_{k+1}-beta_k}], each expectation over MCMC
  draws at the *lower* rung — unbiased ratio estimates that telescope;
* **thermodynamic integration** (Lartillot & Philippe 2006): log Z =
  integral_0^1 E_beta[log L] d beta, trapezoid over the same draws —
  a consistency cross-check with different bias characteristics.

TPU-first: each rung reuses the in-house NUTS engine (vmapped chains,
chunked device programs) warm-started from the previous rung's state, so
the ladder costs little more than one posterior run. The beta^5 schedule
concentrates rungs near beta=0 where E_beta[log L] changes fastest.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes.wrapper import BayesianFlow
from naz_tpu.mcmc.run import MCMCRunConfig, init_chains, sample_nuts, warmup_nuts


@dataclasses.dataclass(frozen=True)
class SteppingStoneConfig:
    n_temps: int = 16
    # beta_k = (k/(K-1))^power; 5.0 is the standard choice (rungs cluster
    # near the prior, where the integrand varies fastest)
    schedule_power: float = 5.0
    num_warmup: int = 300  # first rung (the prior) adapts from scratch
    num_warmup_rest: int = 50  # later rungs re-adapt from a warm start
    num_samples: int = 100  # per chain per rung
    num_chains: int = 4
    seed: int = 0
    max_depth: int = 8
    steps_per_program: int = 25
    chain_exec: str = "vmap"
    ll_chunk: int = 64  # draws per jitted log-likelihood evaluation
    verbose: bool = False


class PowerEvidenceResult(NamedTuple):
    log_evidence: float  # stepping-stone estimate
    log_evidence_se: float  # delta-method SE (per-rung, ESS-adjusted)
    log_evidence_ti: float  # thermodynamic-integration cross-check
    betas: np.ndarray  # (K,)
    mean_log_l: np.ndarray  # (K,) E_beta[log L]
    log_ratios: np.ndarray  # (K-1,) per-rung log r_k
    per_step_ess: np.ndarray  # (K-1,) IS effective sample size of each rung
    accept_prob: np.ndarray  # (K,) mean accept prob per rung


def stepping_stone_evidence(
    bayes_flow: BayesianFlow,
    cfg: SteppingStoneConfig = SteppingStoneConfig(),
) -> PowerEvidenceResult:
    """Estimate log evidence by stepping-stone sampling over power posteriors.

    The estimator only involves log-likelihood values at MCMC draws, so it
    is exact with respect to any additive constants in the prior/Jacobian
    terms of the potential (Z_0 = 1 because the prior is proper).
    """
    bf = bayes_flow
    K = cfg.n_temps
    if K < 2:
        raise ValueError(f"n_temps must be >= 2 (prior and posterior), got {K}")
    betas = (np.arange(K, dtype=np.float64) / (K - 1)) ** cfg.schedule_power

    def make_potential(beta):
        if beta == 0.0:
            # prior rung: skip the likelihood entirely (XLA would still
            # evaluate the full data pass under a 0-weight)
            def pot(u):
                c = bf.constrain(u)
                return -(c["log_det"] + c["log_prior"])

            return pot

        def pot(u):
            c = bf.constrain(u)
            ll = bf.log_likelihood_flat(c["params_flat"])
            return -(beta * ll + c["log_det"] + c["log_prior"])

        return pot

    base_cfg = MCMCRunConfig(
        num_warmup=cfg.num_warmup,
        num_samples=cfg.num_samples,
        num_chains=cfg.num_chains,
        max_depth=cfg.max_depth,
        seed=cfg.seed,
        steps_per_program=cfg.steps_per_program,
        chain_exec=cfg.chain_exec,
    )

    ll_of_u = jax.jit(
        jax.vmap(lambda u: bf.log_likelihood_flat(bf.constrain(u)["params_flat"]))
    )

    def lls_for(u_draws):  # (S, C, dim) -> (S*C,)
        flat = u_draws.reshape(-1, u_draws.shape[-1])
        out = []
        for s in range(0, flat.shape[0], cfg.ll_chunk):
            out.append(np.asarray(ll_of_u(flat[s : s + cfg.ll_chunk])))
        return np.concatenate(out)

    q = bf.init_positions(jax.random.PRNGKey(cfg.seed + 1), cfg.num_chains)
    ll_rows, accepts = [], []
    for k, beta in enumerate(betas):
        pot = make_potential(float(beta))
        rcfg = dataclasses.replace(
            base_cfg,
            seed=cfg.seed + 101 * k,
            num_warmup=cfg.num_warmup if k == 0 else cfg.num_warmup_rest,
        )
        state = init_chains(pot, q, rcfg)
        state, _ = warmup_nuts(pot, state, rcfg)
        state, batch = sample_nuts(pot, state, cfg.num_samples, rcfg)
        q = state.q  # warm start the next rung
        ll_rows.append(lls_for(np.asarray(batch.q)))
        accepts.append(float(np.mean(np.asarray(batch.accept_prob))))
        if cfg.verbose:
            print(
                f"rung {k + 1}/{K} beta={beta:.4g}: "
                f"E[logL]={ll_rows[-1].mean():.2f} "
                f"accept={accepts[-1]:.2f}",
                flush=True,
            )

    ll_mat = np.stack(ll_rows)  # (K, S*C)
    n = ll_mat.shape[1]
    log_ratios, ess, se2 = [], [], []
    for k in range(K - 1):
        w = (betas[k + 1] - betas[k]) * ll_mat[k]
        m = w.max()
        log_ratios.append(m + math.log(np.exp(w - m).sum()) - math.log(n))
        wn = np.exp(w - m)
        ess.append(float(wn.sum() ** 2 / (wn**2).sum()))
        # delta method for log r_k = log mean(exp w): Var ~ Var(wn) /
        # (n_eff * mean(wn)^2), with the IS ESS as the effective count
        # (the draws behind wn are autocorrelated MCMC output)
        se2.append(float(wn.var() / (max(ess[-1], 1.0) * wn.mean() ** 2)))
    mean_ll = ll_mat.mean(axis=1)
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy<2 compat
    log_z_ti = float(trapezoid(mean_ll, betas))
    return PowerEvidenceResult(
        log_evidence=float(np.sum(log_ratios)),
        log_evidence_se=float(np.sqrt(np.sum(se2))),
        log_evidence_ti=log_z_ti,
        betas=betas,
        mean_log_l=mean_ll,
        log_ratios=np.asarray(log_ratios),
        per_step_ess=np.asarray(ess),
        accept_prob=np.asarray(accepts),
    )

"""Intermediate-scale SBC pass (VERDICT r4 next-round #3).

Purpose: back the statement "the sampler/posterior machinery is
calibrated; the production coverage deficit is model bias" with a
ranked-statistic histogram at a production-ish dimension, not argument.
The toy-dim SBC tests (tests/test_sbc_flow.py) validate the machinery at
P ~ 10^2; the production coverage runs operate at P ~ 7.5e5. This driver
sits between: R = 48 replications of a 4-layer x [64,64] conditional-free
MAF weight posterior (P = 18,448 weights each) packed as independent
coordinate blocks of ONE product target — total sampled dimension
R * P = 885,504, the same order as the 2-D production config's 746,464 —
run through the full windowed ChEES warmup (Stan schedule: fast init
buffer, doubling slow mass windows, terminal fast buffer) exactly as
production does.

Procedure per Talts et al. 2018 (arXiv:1804.06788), packed form (the
layout used by tests/test_sbc_flow.py::test_sbc_flow_weights_chees):
std_r ~ U(-1,1)^P, y_r ~ flow(params(std_r)) for each replication r;
U(q) = sum_r U_r(q_r); sample; rank fixed projections of each std_r among
its thinned posterior draws; ranks must be uniform across replications.

Runs on CPU (JAX_PLATFORMS=cpu) so it never contends with the chip.
Artifacts: __run_sbc__/sbc_intermediate.json (+ ranks npz).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes import BayesianFlow, make_flow_loglik
from naz_tpu.flows import maf_flow
from naz_tpu.mcmc import ChEESConfig, run_chees
from naz_tpu.mcmc.diagnostics import effective_sample_size, split_rhat
from naz_tpu.stats import rank_uniformity, sbc_ranks

N_REP = int(os.environ.get("SBC_NREP", "48"))
N_OBS = int(os.environ.get("SBC_NOBS", "256"))
L = 63  # ranked draws per replication (L+1 = 64 divisible by 4 bins)
SCALE_MAX = float(os.environ.get("SBC_SIGMA", "0.1"))  # production sweep value
NUM_WARMUP = int(os.environ.get("SBC_WARMUP", "500"))
NUM_SAMPLES = int(os.environ.get("SBC_DRAWS", "128"))
NUM_CHAINS = 4
OUT_DIR = os.environ.get("SBC_OUT", "__run_sbc__")


def main():
    t0 = time.time()
    flow = maf_flow(2, n_layers=4, hidden_dims=(64, 64), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    # non-zero center: a zero MLE weight makes the multiplicative prior
    # params = center*(1+scale*std) degenerate in that coordinate
    center = jax.tree.map(
        lambda a: a + 0.2 * jax.random.normal(jax.random.PRNGKey(99), a.shape),
        p0,
    )
    bf_proto = BayesianFlow(
        make_flow_loglik(flow, jnp.zeros((1, 2))), center, scale_max=SCALE_MAX
    )
    P = bf_proto.num_weights
    dim = bf_proto.dim
    print(
        f"sbc-intermediate: R={N_REP} P={P} packed dim={N_REP * dim} "
        f"sigma0={SCALE_MAX} N_obs={N_OBS} warmup={NUM_WARMUP} "
        f"draws={NUM_SAMPLES}x{NUM_CHAINS}",
        flush=True,
    )

    # simulate datasets at prior weights
    k_std, k_y = jax.random.split(jax.random.PRNGKey(1))
    std_true = jax.random.uniform(
        k_std, (N_REP, P), minval=-1, maxval=1
    )
    pf = jax.vmap(
        lambda s: bf_proto.params_flat_from(s, jnp.asarray(SCALE_MAX))
    )(std_true)
    y = jax.vmap(lambda p, k: flow.sample(bf_proto.unravel(p), k, N_OBS))(
        pf, jax.random.split(k_y, N_REP)
    )
    y = jax.block_until_ready(y)
    print(f"simulated datasets in {time.time()-t0:.0f}s", flush=True)

    def potential(q):
        def one(q_r, y_r):
            return BayesianFlow(
                make_flow_loglik(flow, y_r), center, scale_max=SCALE_MAX
            ).potential(q_r)

        return jnp.sum(jax.vmap(one)(q.reshape(N_REP, dim), y))

    cfg = ChEESConfig(
        num_warmup=NUM_WARMUP, num_samples=NUM_SAMPLES,
        num_chains=NUM_CHAINS, seed=2, steps_per_program=16,
        max_leapfrogs=256, thin_draws=1,
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (NUM_CHAINS, N_REP * dim)
    )
    out = run_chees(potential, q0, cfg)
    print(
        f"sampled in {time.time()-t0:.0f}s  eps={out['step_size']:.4g} "
        f"T={out['traj_len']:.4g}",
        flush=True,
    )

    samples = np.asarray(out["samples"])  # (draws, chains, R*dim)

    # mixing gate on diagnostic projections (the packed target's energy is
    # a sum over blocks; use per-block first-coordinate projections)
    proj = samples.reshape(samples.shape[0], NUM_CHAINS, N_REP, dim)[..., 0]
    rhat = np.asarray(split_rhat(proj))  # per replication
    ess = np.asarray(effective_sample_size(proj))
    print(
        f"mixing: split-Rhat max {rhat.max():.4f} med {np.median(rhat):.4f}; "
        f"ESS min {ess.min():.0f} med {np.median(ess):.0f}",
        flush=True,
    )

    # pool chains, stride-thin to L draws per replication
    total = samples.shape[0] * NUM_CHAINS
    pooled = samples.transpose(0, 1, 2).reshape(total, N_REP, dim)
    stride = total // L
    u = pooled[:: stride][:L]  # (L, R, dim)
    u = np.swapaxes(u, 0, 1)  # (R, L, dim)

    std_draws = np.asarray(
        jax.vmap(
            lambda uu: jax.vmap(lambda q: bf_proto.constrain(q)["standard"])(uu)
        )(jnp.asarray(u))
    )  # (R, L, P)
    std_true = np.asarray(std_true)

    rng = np.random.default_rng(5)
    projs = rng.standard_normal((3, P)) / np.sqrt(P)
    report = {
        "n_rep": N_REP, "P": P, "packed_dim": int(N_REP * dim),
        "sigma0": SCALE_MAX, "n_obs": N_OBS,
        "num_warmup": NUM_WARMUP,
        "num_samples": NUM_SAMPLES, "num_chains": NUM_CHAINS, "L": L,
        "step_size": out["step_size"], "traj_len": out["traj_len"],
        "split_rhat_max": float(rhat.max()),
        "split_rhat_median": float(np.median(rhat)),
        "ess_min": float(ess.min()), "ess_median": float(np.median(ess)),
        "wall_s": round(time.time() - t0, 1),
        "tests": [],
    }
    all_ranks = {}
    for i, w in enumerate(projs):
        ranks = sbc_ranks(std_true @ w, std_draws @ w)
        p, chi2, counts = rank_uniformity(ranks, L, n_bins=4)
        report["tests"].append(
            {"stat": f"proj{i}", "p": float(p), "chi2": float(chi2),
             "counts": [int(c) for c in counts]}
        )
        all_ranks[f"proj{i}"] = ranks
    for c in (0, 1):
        ranks = sbc_ranks(std_true[:, c], std_draws[:, :, c])
        p, chi2, counts = rank_uniformity(ranks, L, n_bins=4)
        report["tests"].append(
            {"stat": f"coord{c}", "p": float(p), "chi2": float(chi2),
             "counts": [int(c_) for c_ in counts]}
        )
        all_ranks[f"coord{c}"] = ranks

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez(
        os.path.join(OUT_DIR, "sbc_ranks.npz"),
        **{k: np.asarray(v) for k, v in all_ranks.items()},
    )
    with open(os.path.join(OUT_DIR, "sbc_intermediate.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)
    worst_p = min(t["p"] for t in report["tests"])
    print(
        f"sbc-intermediate: worst p-value {worst_p:.4f} "
        f"({'PASS' if worst_p > 1e-3 else 'FAIL'}) in {time.time()-t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()

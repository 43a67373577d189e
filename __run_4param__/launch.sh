#!/bin/bash
# Round-5 recipe: the 19M-weight 4-param exact posterior (VERDICT r3 #1,
# r4 #1). The MLE (18x[512]^5, val NLL -3.13, 600 epochs) and dataset are
# IN GIT — go straight to sampling. fthin 8 halves the grad cost vs the
# r3 run's fthin 4 (a reference knob, hmc_maf_exact.py --fthin).
#
# TWO PHASES, one checkpoint dir (idempotent across restarts):
#
#  1. WARMUP under --max-leapfrogs 96: warmup integrates whole-trajectory
#     device programs (chunking is a sampling-phase feature,
#     ChEESConfig.leapfrogs_per_program), and the remote worker kills
#     programs over ~1 min — at this scale 4 chains x 720 leapfrogs x
#     ~65 ms/grad would be a ~3-minute program, i.e. a guaranteed kill
#     loop with no mid-warmup checkpoint. 96 keeps the worst warmup
#     program at ~25 s. T adapts ABOVE the cap (the non-ratcheting clip,
#     chees.py warmup), so the adapted T is still full-length.
#  2. SAMPLING with --max-leapfrogs 720 --leapfrogs-per-program 96:
#     resumes from the phase-1 warmup checkpoint (chees_state.npz) and
#     integrates the full adapted trajectory (~T/eps ~ 700 leapfrogs at
#     sigma0=0.01, r3 measurement) as host-sequenced 96-step programs.
#
# Phase 1 is guarded on the warmup checkpoint so restarts after warmup
# go straight to (resumed, chunked) sampling.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e

COMMON="--data __run_4param__/synth_4param.h5 --fthin ${FTHIN:-8} \
  --mle-params __run_4param__/mle_4param.npz \
  --layers 18 --hidden 512 512 512 512 512 \
  --use-pallas --compute-dtype bfloat16 \
  --kernel chees --num-chains 4 --chain-exec map --sigma 0.01 \
  --min-leapfrogs 4 --steps-per-program 1 \
  --chckpt __run_4param__/ckpt --thin-draws 8"

if [ ! -f __run_4param__/ckpt/chees_state.npz ]; then
  python -u -m naz_tpu hmc $COMMON \
    --num-warmup ${WARMUP:-140} --num-samples 8 --nbatch 8 \
    --curvature-init-mass --max-leapfrogs 96 \
    --out-thin 8 --out __run_4param__/warm_phase.npz
fi

exec python -u -m naz_tpu hmc $COMMON \
  --num-warmup ${WARMUP:-140} --num-samples ${DRAWS:-500} --nbatch ${NBATCH:-50} \
  --curvature-init-mass \
  --max-leapfrogs ${MAXL:-720} --leapfrogs-per-program 96 \
  --out-thin 1 --out __run_4param__/post_4param.npz

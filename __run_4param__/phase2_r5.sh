#!/bin/bash
# Round-5 phase-2 (sampling) of the 19M-weight 4-param posterior, budget-
# sized for the final chip window: the launch.sh phase-2 defaults
# (DRAWS=500) assume an open-ended budget; at the measured ~60 ms/grad
# (fthin 8 — the 19M-weight model is compute-dominated, so halving the
# data did NOT halve the grad cost) a full-trajectory draw costs ~1-2 min
# across the 4 map-executed chains. This variant takes DRAWS/NBATCH/THIN
# from the environment with defaults sized to a ~1 h sampling slot, and
# resumes from the phase-1 warmup checkpoint (chees_state.npz) exactly
# like launch.sh phase 2. Chip is NOT timeshared on this runtime
# (a second process raises FailedPrecondition) — run solo.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e

exec python -u -m naz_tpu hmc \
  --data __run_4param__/synth_4param.h5 --fthin ${FTHIN:-8} \
  --mle-params __run_4param__/mle_4param.npz \
  --layers 18 --hidden 512 512 512 512 512 \
  --use-pallas --compute-dtype bfloat16 \
  --kernel chees --num-chains 4 --chain-exec map --sigma 0.01 \
  --min-leapfrogs 4 --steps-per-program 1 \
  --chckpt __run_4param__/ckpt --thin-draws ${THIN:-2} \
  --num-warmup ${WARMUP:-140} --num-samples ${DRAWS:-36} --nbatch ${NBATCH:-6} \
  --curvature-init-mass \
  --max-leapfrogs ${MAXL:-600} --leapfrogs-per-program 96 \
  --out-thin 1 --out __run_4param__/post_4param.npz

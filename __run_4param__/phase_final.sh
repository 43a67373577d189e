#!/bin/bash
# Final-window variant of phase2_r5.sh: the uncapped warmup's per-
# iteration cost (L -> 600 as eps adapts down, ~140 s/iter across the 4
# map-executed chains) does not fit the closing chip window, so warmup
# runs under the launch.sh phase-1 design instead: --warmup-max-leapfrogs
# 96 (T still adapts ABOVE the cap; the non-ratcheting clip) with 60
# windowed iterations from the curvature-init mass. Sampling then
# integrates the adapted trajectory as chunked 96-step programs up to
# MAXL (default 384 — a cost/mixing compromise: 4x the r3 diffusive cap,
# ~0.4 of the adapted full T ~ 900).
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
  --num-warmup ${WARMUP:-60} --num-samples ${DRAWS:-24} --nbatch ${NBATCH:-4} \
  --curvature-init-mass \
  --max-leapfrogs ${MAXL:-384} --warmup-max-leapfrogs 96 \
  --leapfrogs-per-program 96 \
  --out-thin 1 --out __run_4param__/post_4param.npz

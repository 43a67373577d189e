#!/bin/bash
# Round-5 recipe: the 19M-weight 4-param exact posterior (VERDICT r3 #1).
# The MLE (18x[512]^5, val NLL -3.13, 600 epochs) and dataset are IN GIT —
# go straight to sampling. Budget arithmetic: PERFORMANCE.md "chunked
# leapfrog programs". fthin 8 halves the grad cost vs the r3 run's
# fthin 4 (a reference knob, hmc_maf_exact.py --fthin); chunked
# trajectories (--leapfrogs-per-program) lift the watchdog's 96-leapfrog
# cap so draws decorrelate at the adapted T.
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
  --kernel chees --num-warmup ${WARMUP:-140} --num-samples ${DRAWS:-500} \
  --num-chains 4 --chain-exec map --sigma 0.01 --curvature-init-mass \
  --min-leapfrogs 4 --max-leapfrogs ${MAXL:-720} \
  --leapfrogs-per-program 96 --steps-per-program 1 \
  --chckpt __run_4param__/ckpt --nbatch 50 \
  --thin-draws 8 --out-thin 1 --out __run_4param__/post_4param.npz

#!/bin/bash
# 4-D coverage calibration of the 19M-weight 4-param posterior
# (reference: calibrate_4p.py:111-168 — 8e5 PPD samples per draw,
# equal-quantile bins at nq in {5^4, 7^4}).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e
exec python -u -m naz_tpu calibrate \
  --data __run_4param__/synth_4param.h5 \
  --layers 18 --hidden 512 512 512 512 512 --use-pallas \
  --posterior __run_4param__/post_4param.npz \
  --nq 625 2401 --n-samples 800000 --max-draws ${MAXDRAWS:-64} \
  --out __run_4param__/calib_4p

#!/bin/bash
# Round-3 2-D production posterior (VERDICT #2): publication budget
# (1000 warmup + 1000 draws x 4 chains) at the reference 2506.05657 shape
# (16x[150]^3, N=190k), mixed precision, checkpointed. Stage 1 trains the
# MLE if its checkpoint is absent; rerunning resumes sampling.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e
if [ ! -f __run_2d__/mle_2d.npz ]; then
  python -u -m naz_tpu train-mle \
    --data __run_2d__/synth_2d.h5 \
    --layers 16 --hidden 150 150 150 \
    --epochs 600 --batch-frac 0.05 \
    --out __run_2d__/mle_2d.npz
fi
exec python -u -m naz_tpu hmc \
  --data __run_2d__/synth_2d.h5 \
  --mle-params __run_2d__/mle_2d.npz \
  --layers 16 --hidden 150 150 150 --compute-dtype bfloat16 \
  --kernel chees --num-warmup 1000 --num-samples 1000 --num-chains 4 \
  --chain-exec map --sigma 0.01 \
  --min-leapfrogs 4 --max-leapfrogs 96 --steps-per-program 4 \
  --chckpt __run_2d__/ckpt --nbatch 200 \
  --thin-draws 8 --out-thin 1 --out __run_2d__/post_2d.npz

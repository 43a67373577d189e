#!/bin/bash
# Round-5 production aleatoric bootstrap ensemble (VERDICT r4 #2's "either
# way" deliverable): the coverage-mechanism decomposition
# (__run_sweep__/coverage_mechanism.json) showed the weight posterior
# widens around ONE MLE and cannot cover the truth bin densities; the
# reference's complementary lever re-fits the center across bootstrap
# resamples (train_mle_aleatoric.py:20-78). This trains the ensemble at
# the production 2-D shape (16x[150]^3, N=190k, true bootstrap:
# resample-with-replacement at full N) and runs the bin-level
# ensemble-coverage analysis (tools/ensemble_coverage.py) that decides
# fit-random vs systematic bias.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e

if [ ! -f __run_ensemble__/ensemble_2d.npz ]; then
  python -u -m naz_tpu train-ensemble \
    --data __run_2d__/synth_2d.h5 \
    --layers 16 --hidden 150 150 150 \
    --members ${MEMBERS:-6} --fthin 1 --resample bootstrap \
    --epochs ${EPOCHS:-400} --batch-frac 0.05 \
    --out __run_ensemble__/ensemble_2d.npz \
    2>&1 | tee __run_ensemble__/train.log
fi

python -u tools/ensemble_coverage.py \
  --data __run_2d__/synth_2d.h5 \
  --ensemble __run_ensemble__/ensemble_2d.npz \
  --nq 25 --n-samples 1000000 \
  --out __run_ensemble__/ensemble_coverage.json \
  2>&1 | tee __run_ensemble__/analysis.log

#!/bin/bash
# Round-4 sigma0-sweep coverage calibration study (VERDICT r3 #2): the
# reference paper's procedure for choosing the weight-prior scale
# (examples/papers/2506.05657/plot_callibration.py:22-36, driven by
# hmc_maf_exact.py:44-52 --sigma across runs). Reuses the committed 2-D
# production MLE (__run_2d__/mle_2d.npz). Each run is checkpointed +
# resumable (rerun resumes). Consecutive sigmas chain through
# --warm-start: each run seeds eps/T/mass from the previous sigma's
# adapted state (mcmc.chees.load_adaptation), skipping the ~15-min
# identity-mass warmup crawl; the windowed warmup still re-adapts for
# the new posterior.
#
# Budget per sigma via $WARMUP/$DRAWS (default 400+400; sigma=0.01 kept
# its 600-iteration warmup checkpoint from the first launch and resumes
# straight into sampling).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e
WARMUP=${WARMUP:-400}
DRAWS=${DRAWS:-400}
SIGMAS=${SIGMAS:-"0.01 0.03 0.1 0.3"}

PREV=""
for S in $SIGMAS; do
  if [ ! -f __run_sweep__/post_${S}.npz ]; then
    WS=""; WSS=""
    if [ -n "$PREV" ] && [ -f __run_sweep__/ckpt_${PREV}/chees_state.npz ]; then
      WS="--warm-start __run_sweep__/ckpt_${PREV}"
      WSS="--warm-start-sigma ${PREV}"
    fi
    python -u -m naz_tpu hmc \
      --data __run_2d__/synth_2d.h5 \
      --mle-params __run_2d__/mle_2d.npz \
      --layers 16 --hidden 150 150 150 --compute-dtype bfloat16 \
      --kernel chees --num-warmup $WARMUP --num-samples $DRAWS --num-chains 4 \
      --chain-exec map --sigma $S $WS $WSS \
      --min-leapfrogs 4 --max-leapfrogs 96 --steps-per-program 4 \
      --chckpt __run_sweep__/ckpt_${S} --nbatch 200 \
      --thin-draws 8 --out-thin 1 --out __run_sweep__/post_${S}.npz \
      2>&1 | tee __run_sweep__/hmc_${S}.log
  fi
  PREV=$S
  if [ ! -f __run_sweep__/calib_${S}_nq100.txt ]; then
    python -u -m naz_tpu calibrate \
      --data __run_2d__/synth_2d.h5 \
      --layers 16 --hidden 150 150 150 \
      --posterior __run_sweep__/post_${S}.npz \
      --nq 25 100 --n-samples 1000000 --max-draws 64 \
      --out __run_sweep__/calib_${S} \
      2>&1 | tee __run_sweep__/calib_${S}.log
  fi
done

python -u tools/sweep_report.py __run_sweep__ | tee __run_sweep__/report.txt

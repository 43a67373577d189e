#!/bin/bash
# Round-5 sweep extension (VERDICT r4 #2): run sigma0=0.3 — the point the
# r4 sweep listed in SIGMAS but never reached — with chunked full-length
# trajectories (--leapfrogs-per-program), warm-started from the adapted
# sigma0=0.1 state with the (sigma_prev/sigma_new)^2 mass rescale.
#
# Two phases, one checkpoint dir (same pattern as __run_4param__/launch.sh):
# warmup under a 96-leapfrog cap (whole-trajectory warmup programs stay
# ~10 s), then resumed sampling at the full adapted T (~450+ leapfrogs at
# sigma0 >= 0.1, r4 measurement) as 96-step chunked programs.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e
S=${S:-0.3}
PREV=${PREV:-0.1}

COMMON="--data __run_2d__/synth_2d.h5 \
  --mle-params __run_2d__/mle_2d.npz \
  --layers 16 --hidden 150 150 150 --compute-dtype bfloat16 \
  --kernel chees --num-chains 4 --chain-exec map --sigma $S \
  --min-leapfrogs 4 --steps-per-program 1 \
  --chckpt __run_sweep__/ckpt_${S} --thin-draws 8"

if [ ! -f __run_sweep__/ckpt_${S}/chees_state.npz ]; then
  python -u -m naz_tpu hmc $COMMON \
    --warm-start __run_sweep__/ckpt_${PREV} --warm-start-sigma ${PREV} \
    --num-warmup ${WARMUP:-300} --num-samples 8 --nbatch 8 \
    --max-leapfrogs 96 \
    --out-thin 8 --out __run_sweep__/warm_${S}.npz \
    2>&1 | tee -a __run_sweep__/hmc_${S}.log
fi

if [ ! -f __run_sweep__/post_${S}.npz ]; then
  python -u -m naz_tpu hmc $COMMON \
    --num-warmup ${WARMUP:-300} --num-samples ${DRAWS:-120} --nbatch ${NBATCH:-40} \
    --max-leapfrogs ${MAXL:-720} --leapfrogs-per-program 96 \
    --out-thin 1 --out __run_sweep__/post_${S}.npz \
    2>&1 | tee -a __run_sweep__/hmc_${S}.log
fi

if [ ! -f __run_sweep__/calib_${S}_nq100.txt ]; then
  python -u -m naz_tpu calibrate \
    --data __run_2d__/synth_2d.h5 \
    --layers 16 --hidden 150 150 150 \
    --posterior __run_sweep__/post_${S}.npz \
    --nq 25 100 --n-samples 1000000 --max-draws 64 \
    --out __run_sweep__/calib_${S} \
    2>&1 | tee __run_sweep__/calib_${S}.log
fi

python -u tools/sweep_report.py __run_sweep__ | tee __run_sweep__/report.txt

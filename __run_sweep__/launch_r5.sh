#!/bin/bash
# Round-5 sweep extension (VERDICT r4 #2): run sigma0=0.3 — the point the
# r4 sweep listed in SIGMAS but never reached — with chunked full-length
# trajectories, warm-started from the adapted sigma0=0.1 state with the
# (sigma_prev/sigma_new)^2 mass rescale.
#
# Single invocation thanks to --warmup-max-leapfrogs + chunked warmup:
# warmup runs a tight 96-leapfrog budget (cost control; T still adapts
# above the cap), sampling runs the full adapted T (~450+ leapfrogs at
# sigma0 >= 0.1, r4 measurement) as 96-step watchdog-safe programs.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e
S=${S:-0.3}
PREV=${PREV:-0.1}
# Budget defaults (round-5 final-chip-window arithmetic): warm-started
# from sigma0=0.1's adapted eps/T/mass, 150 windowed re-adapt iterations
# suffice (vs 300 cold); 64 full-trajectory draws/chain at the adapted
# T ~ 450 leapfrogs are near-independent (256 total), enough for the
# nq<=100 coverage readout at split-Rhat <= 1.05. thin-draws 4 keeps
# 16 full positions/chain (64 total, --max-draws 64 downstream).

if [ ! -f __run_sweep__/post_${S}.npz ]; then
  WS=""
  if [ ! -f __run_sweep__/ckpt_${S}/chees_state.npz ] && [ -f __run_sweep__/ckpt_${PREV}/chees_state.npz ]; then
    WS="--warm-start __run_sweep__/ckpt_${PREV} --warm-start-sigma ${PREV}"
  fi
  python -u -m naz_tpu hmc \
    --data __run_2d__/synth_2d.h5 \
    --mle-params __run_2d__/mle_2d.npz \
    --layers 16 --hidden 150 150 150 --compute-dtype bfloat16 \
    --kernel chees --num-chains 4 --chain-exec map --sigma $S $WS \
    --num-warmup ${WARMUP:-150} --num-samples ${DRAWS:-64} --nbatch ${NBATCH:-16} \
    --min-leapfrogs 4 --steps-per-program 1 \
    --max-leapfrogs ${MAXL:-720} --warmup-max-leapfrogs 96 \
    --leapfrogs-per-program 96 \
    --chckpt __run_sweep__/ckpt_${S} --thin-draws ${THIN:-4} \
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

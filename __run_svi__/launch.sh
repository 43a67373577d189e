#!/bin/bash
# Round-4 production SVI + model-comparison (VERDICT r3 #3/#4): the
# reference's second paper pipeline at the 2-D production config —
# svi_maf_exact.py:125-132 settings (7000 steps), IS evidence with the
# fitted guide proposal (train_flows.py:358-380), BIC
# (compute_bic_simpler.py), compared against the converged ChEES
# posterior (__run_2d__/post_2d.npz).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
set -e
if [ ! -f __run_svi__/svi_2d.npz ]; then
  python -u -m naz_tpu svi \
    --data __run_2d__/synth_2d.h5 \
    --mle-params __run_2d__/mle_2d.npz \
    --layers 16 --hidden 150 150 150 --compute-dtype bfloat16 \
    --num-steps 7000 --step-size 5e-3 --sigma 0.01 \
    --evidence-samples 512 --evidence-batch 8 --posterior-draws 128 \
    --out __run_svi__/svi_2d.npz \
    2>&1 | tee __run_svi__/svi_2d.log
  tail -1 __run_svi__/svi_2d.log > __run_svi__/svi_2d.json
fi
# SVI posterior coverage through the same calibrate engine as the sweep
if [ ! -f __run_svi__/calib_svi_nq100.txt ]; then
  python -u -m naz_tpu calibrate \
    --data __run_2d__/synth_2d.h5 \
    --layers 16 --hidden 150 150 150 \
    --posterior __run_svi__/svi_2d.npz \
    --nq 25 100 --n-samples 1000000 --max-draws 64 \
    --out __run_svi__/calib_svi \
    2>&1 | tee __run_svi__/calib_svi.log
fi
python -u tools/svi_vs_nuts.py __run_2d__/post_2d.npz __run_svi__/svi_2d.npz \
  --svi-json __run_svi__/svi_2d.json --n-data 190000 \
  --out __run_svi__/comparison_table.md | tee __run_svi__/comparison.log

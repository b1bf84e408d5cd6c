#!/bin/bash
# Round-5 chip session 1: parity checkpoint training (VERDICT #1 prerequisite),
# then the r5_queue1 measurement sweep. Run detached:
#   setsid nohup bash tools/r5_run1.sh > /tmp/r5_run1.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r5_run1.log docs/r5_run1_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

date
# coco8 overfit checkpoint for tools/parity_eval.py (the one unproven BASELINE claim)
timeout 5400 python tools/train_parity.py 250 320
date
ls -la /tmp/tpu_runs/overfit/weights/ || echo PARITY_TRAIN_FAILED

bash tools/r5_queue1.sh
echo R5_RUN1_DONE

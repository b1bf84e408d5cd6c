#!/bin/bash
# Round-5 queue 4: parity retrain with the collapse-fixed recipe
# (warmup_bias_lr=0 under explicit AdamW) + the mAP-parity artifacts.
# Run detached AFTER queue 3:
#   setsid nohup bash tools/r5_queue4.sh > /tmp/r5_queue4.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r5_queue4.log docs/r5_queue4_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

for i in $(seq 1 720); do
  grep -q R5_QUEUE3_DONE /tmp/r5_queue3.log 2>/dev/null && break
  sleep 30
done

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
timeout 5400 python tools/train_parity.py 600 320
date
ls -la /tmp/tpu_runs/overfit/weights/ || { echo PARITY_TRAIN_FAILED; exit 1; }

date
timeout 5400 python tools/parity_eval.py /tmp/tpu_runs/overfit/weights/last.npz 320 train PARITY_r05.json
date
timeout 5400 python tools/parity_eval.py /tmp/tpu_runs/overfit/weights/last.npz 320 val PARITY_r05_val.json || true

date
echo R5_QUEUE4_DONE

#!/bin/bash
# Round-5 queue 2: hard-overfit parity checkpoint retrain (the queue-1 ckpt
# produced ZERO detections — auto-lr 1.2e-4 was too cold) + the end-to-end
# mAP-parity artifact on both splits (VERDICT #1). Waits for queue 1 so the
# retrain can't contaminate its timed stages. Run detached:
#   setsid nohup bash tools/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r5_queue2.log docs/r5_queue2_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# wait (up to 6h) for queue 1 to finish
for i in $(seq 1 720); do
  grep -q R5_QUEUE1_DONE /tmp/r5_queue1.log 2>/dev/null && break
  sleep 30
done
grep -q R5_QUEUE1_DONE /tmp/r5_queue1.log || echo "queue1 not done; proceeding anyway"

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
# same shapes as queue 1's run (batch 8, 320px, AdamW) -> cached train-step compile
timeout 5400 python tools/train_parity.py 600 320
date
ls -la /tmp/tpu_runs/overfit/weights/ || { echo PARITY_TRAIN_FAILED; exit 1; }

date
# parity on the memorized train split (real detections) -> the headline artifact
timeout 5400 python tools/parity_eval.py /tmp/tpu_runs/overfit/weights/last.npz 320 train PARITY_r05.json
date
# and the val split for completeness
timeout 5400 python tools/parity_eval.py /tmp/tpu_runs/overfit/weights/last.npz 320 val PARITY_r05_val.json || true

date
echo R5_QUEUE2_DONE

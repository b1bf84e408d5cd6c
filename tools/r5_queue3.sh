#!/bin/bash
# Round-5 queue 3: flip A/Bs informed by queue 1 + the round's final bench.
#   - GATHER_MODE=pallas vs blocked at the headline shape (tail_profile)
#   - any train-side flip re-measures (train_bench)
#   - bench.py (the artifact headline) + latency
# Run detached AFTER queue 2:
#   setsid nohup bash tools/r5_queue3.sh > /tmp/r5_queue3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r5_queue3.log docs/r5_queue3_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

for i in $(seq 1 720); do
  grep -q R5_QUEUE2_DONE /tmp/r5_queue2.log 2>/dev/null && break
  sleep 30
done

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
# batch-scaling anomaly FIRST (r5 queue1: folded fwd 19.64 ms @64 vs 14.87
# @128; backward scales it to ~36 ms of the bs=64 step): sweep + per-layer
# localization at the two anchor batch sizes
timeout 3600 python tools/batch_scaling.py n 32,64,96,128 --layers 64,128

date
# pallas VMEM row-gather vs blocked one-hot gather, full pipeline at bs=128
TAILPROFILE_STAGES=full_blk8,full_pallas timeout 3600 python tools/tail_profile.py 128

date
# headline with the pallas gather (flip decision data; code default unchanged —
# queue1's bench already recorded blocked-mode 8389.3 img/s; the driver's
# round-end bench.py records the official artifact on whatever default ships)
YLT_GATHER_MODE=pallas timeout 3600 python bench.py

date
echo R5_QUEUE3_DONE

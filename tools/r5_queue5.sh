#!/bin/bash
# Round-5 queue 5: Mosaic-fixed pallas gather A/B + train at bs=96 (the
# measured escape from the bs=64 conv-tiling cliff). Run detached AFTER
# queue 4:
#   setsid nohup bash tools/r5_queue5.sh > /tmp/r5_queue5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r5_queue5.log docs/r5_queue5_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

for i in $(seq 1 720); do
  grep -q R5_QUEUE4_DONE /tmp/r5_queue4.log 2>/dev/null && break
  sleep 30
done

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
# aligned-window pallas row gather vs blocked one-hot, full pipeline bs=128
TAILPROFILE_STAGES=full_blk8,full_pallas timeout 3600 python tools/tail_profile.py 128

date
# train step at bs=96: the batch-scaling sweep (docs/r5_queue3_results.log)
# put the folded fwd at 139 us/img vs 276 at bs=64 — if the full step clears
# >=900 img/s here, the r3 train directive is met one notch above the cliff
timeout 2700 python tools/train_bench.py 96 1

date
echo R5_QUEUE5_DONE

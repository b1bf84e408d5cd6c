#!/bin/bash
# Round-4 measurement queue 7 — run detached:
#   setsid nohup bash tools/r4_queue7.sh > /tmp/r4_queue7.log 2>&1 &
# After the COMPACT_BOX_LOSS flip (queue6 verdict):
#   1. roofline with the dispatch-constant-cancelling two-length timer: fix
#      the HBM bandwidth constant the r2 sweep got wrong (273 GB/s was a
#      latency artifact at 8 iters)
#   2. train_bench 64 / 128 with the compact box loss (VERDICT r3 #4 targets)
#   3. bench.py — the headline artifact with blocked@8 gather
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue7.log docs/r4_queue7_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
timeout 2400 python tools/roofline.py
date
timeout 2700 python tools/train_bench.py 64 1
date
timeout 2700 python tools/train_bench.py 128 1
date
timeout 3600 python bench.py
date
echo R4_QUEUE7_DONE

#!/bin/bash
# Round-4 measurement queue 6 — run detached after queue5 finishes:
#   setsid nohup bash tools/r4_queue6.sh > /tmp/r4_queue6.log 2>&1 &
# Decides, on-chip:
#   1. roofline re-probe: the analytic per-op traffic model (tools/
#      traffic_model.py) shows the measured forward moving ~10.5 GB in 14.7 ms
#      = ~714 GB/s effective — 2.6x the journaled 273 GB/s axpy "measured
#      bandwidth". Re-measure axpy/copy + the stem convs to fix the constant
#      (it anchors every roofline claim in docs/PERF.md).
#   2. loss_profile subset: tal_metrics (failed on a transient relay error in
#      queue5) + full vs full_compact (the compact-K box/DFL chain) -> flip
#      COMPACT_BOX_LOSS or delete it.
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue6.log docs/r4_queue6_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

# wait for queue5 (up to 2h), then a bounded sanity probe
for i in $(seq 1 720); do grep -q R4_QUEUE5_DONE /tmp/r4_queue5.log 2>/dev/null && break; sleep 10; done
date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
timeout 1800 python tools/roofline.py
date
LOSSPROFILE_STAGES=assigner,tal_metrics,full,full_compact \
  timeout 3600 python tools/loss_profile.py 64 20
date
LOSSPROFILE_STAGES=full,full_compact \
  timeout 2700 python tools/loss_profile.py 128 20
date
echo R4_QUEUE6_DONE

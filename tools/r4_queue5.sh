#!/bin/bash
# Round-4 measurement queue 5 — run detached (setsid nohup bash tools/r4_queue5.sh
# > /tmp/r4_queue5.log 2>&1 &). Decides, on-chip:
#   1. tail_profile: GATHER_MODE A/B (dfl_all / ohg / blocked@8,16,32) at the
#      headline shape -> flip nms.GATHER_MODE to the measured winner
#   2. loss_profile: the round-4 loss-tail levers (custom vjps for DFL CE +
#      expectation, value-threshold TAL top-k) vs their autodiff/hierarchical
#      baselines -> keep or revert tal._select_topk_candidates
#   3. train_bench 64/128: the VERDICT r3 #4 targets (>=900 / >=1250 img/s amp)
# bench.py (the headline artifact) runs in a FOLLOW-UP queue after the flips.
#
# Compile hygiene (docs/PERF.md round 4): enable JAX's persistent compilation
# cache so repeat invocations of unchanged graphs skip the remote compile
# (queue4 lost its profiler to a 1933 s cold-relay compile + stage timeout).
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue5.log docs/r4_queue5_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

date
# bounded sanity probe: a wedged relay fails fast instead of eating the queue
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
timeout 3600 python tools/tail_profile.py 128 20
date
timeout 5400 python tools/loss_profile.py 64 20
date
timeout 2700 python tools/train_bench.py 64 1
date
timeout 2700 python tools/train_bench.py 128 1
date
echo R4_QUEUE5_DONE

#!/bin/bash
# Round-3 measurement queue #3: the stages of r3_recovery2.sh that never ran
# (the script was extended after its first execution). Launch detached on a
# QUIET host (no concurrent CPU work -- single-core host contention corrupted
# the r3_recovery.sh stage-6 serve/int8 numbers):
#   setsid nohup bash tools/r3_queue3.sh > /tmp/r3_queue3.log 2>&1 &
# Sequential, generous timeouts, never SIGTERM an active remote compile.
set -x
cd "$(dirname "$0")/.."
date
timeout 900 python -c "import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print('sanity', float((x@x).sum()))" || exit 1
# 1. train batch-size sweep: bs=64 is the target config but 96/128 may tile
#    better (inference sweet spot is 128); nbs=64 keeps accumulate==1 either way
timeout 2700 python tools/train_bench.py 96 1
date
timeout 2700 python tools/train_bench.py 128 1
date
# 1b. backward decomposition (model-only grad, BN-stat overhead, loss bwd share)
timeout 2700 python tools/train_profile2.py
date
# 2. Mosaic remote-compile workaround attempt: the fused-stem HTTP 500 carried
#    "set env var TPU_WORKER_HOSTNAMES manually" -- try it (cheap; unlocks the
#    ~3 ms stem fusion if the far-side compile helper just lacks the hostname)
timeout 2700 env TPU_WORKER_HOSTNAMES=localhost python tools/fusedstem_probe.py
date
# 2b. if any fused/sumtap variant compiled above, confirm at e2e level (the
#     probe times the stem in isolation; the flip decision needs whole-graph)
timeout 3600 env TPU_WORKER_HOSTNAMES=localhost python tools/s2d_bench.py
date
# 3. clean headline rerun on a quiet host (r3_recovery.sh stage 6's serve and
#    m-int8 numbers were depressed by concurrent CPU-side work)
timeout 4500 python bench.py
date
echo R3_QUEUE3_DONE
cp /tmp/r3_queue3.log docs/r3_queue3_results.log 2>/dev/null || true
date

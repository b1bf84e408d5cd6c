#!/bin/bash
# Round-3 follow-up measurement queue (run AFTER tools/r3_recovery.sh):
#   setsid nohup bash tools/r3_recovery2.sh > /tmp/r3_recovery2.log 2>&1 &
# 1. clean roofline rerun (the first run raced this session's stray CPU-forcing
#    probes AND carried a DCE'd carry — fixed to a full-output reduce);
# 2. train_profile (crashed on a missing sys.path bootstrap in the first queue);
# 3. Detect fused-input-read lever e2e (new this session).
# Sequential, generous timeouts, never SIGTERM an active remote compile.
set -x
cd "$(dirname "$0")/.."
date
timeout 900 python -c "import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print('sanity', float((x@x).sum()))" || exit 1
timeout 2700 python tools/roofline.py
date
timeout 2700 python tools/train_profile.py
date
# 2b. train batch-size sweep: bs=64 is the target config but 128 may tile
#     better (inference sweet spot is 128); nbs=64 keeps accumulate==1 either way
timeout 2700 python tools/train_bench.py 96 1
timeout 2700 python tools/train_bench.py 128 1
date
timeout 2700 python tools/detect_fused_bench.py 128 16
date
# 4. Mosaic remote-compile workaround attempt: the fused-stem HTTP 500 carried
#    "set env var TPU_WORKER_HOSTNAMES manually" -- try it (cheap; unlocks the
#    ~3 ms stem fusion if the far-side compile helper just lacks the hostname)
timeout 2700 env TPU_WORKER_HOSTNAMES=localhost python tools/fusedstem_probe.py
date
# 5. clean headline rerun on a quiet host (the first queue's serve/m-int8
#    stages ran while CPU-side work saturated the single host core)
timeout 3600 python bench.py
date
echo R3_RECOVERY2_DONE
cp /tmp/r3_recovery2.log docs/r3_recovery2_results.log 2>/dev/null || true
date

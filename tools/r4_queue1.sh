#!/bin/bash
# Round-4 measurement queue #1: the round-3 stages that never got chip time.
#   1. fused-stem Mosaic compile attempt (TPU_WORKER_HOSTNAMES workaround +
#      sumtap variant that avoids the rejected lane concat)  [VERDICT r3 #1]
#   2. s2d/s4d/fused stem e2e (flip decision needs whole-graph numbers)
#   3. Detect fold_input_convs e2e                            [VERDICT r3 #3]
# Launch detached on a QUIET host:
#   setsid nohup bash tools/r4_queue1.sh > /tmp/r4_queue1.log 2>&1 &
# Sequential, generous timeouts, never SIGTERM an active remote compile.
# Log archival happens on EXIT (ADVICE r3: cp-from-within truncated the log).
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue1.log docs/r4_queue1_results.log 2>/dev/null || true' EXIT
date
timeout 900 python -c "import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print('sanity', float((x@x).sum()))" || exit 1
timeout 2700 env TPU_WORKER_HOSTNAMES=localhost python tools/fusedstem_probe.py
date
timeout 3600 env TPU_WORKER_HOSTNAMES=localhost python tools/s2d_bench.py
date
timeout 2700 python tools/detect_fused_bench.py
date
echo R4_QUEUE1_DONE

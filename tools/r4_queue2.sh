#!/bin/bash
# Round-4 measurement queue #2:
#   1. valnms_bench — scan/fixpoint/blocked suppression + old-vs-fused val tail
#      (flip gate for LARGE_K_MODE="blocked" + the multilabel select-first win)
#   2. train_bench 64/128 amp — the loss-tail levers' effect (VERDICT r3 #4:
#      targets >=900 img/s bs=64, >=1250 bs=128)
#   3. train_profile2 — backward decomposition refresh
# Launch detached on a QUIET host:
#   setsid nohup bash tools/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue2.log docs/r4_queue2_results.log 2>/dev/null || true' EXIT
date
timeout 900 python -c "import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print('sanity', float((x@x).sum()))" || exit 1
timeout 2700 python tools/valnms_bench.py 8 8
date
timeout 2700 python tools/train_bench.py 64 1
date
timeout 2700 python tools/train_bench.py 128 1
date
timeout 2700 python tools/train_profile2.py
date
echo R4_QUEUE2_DONE

#!/bin/bash
# Round-4 measurement queue 8 — run detached:
#   setsid nohup bash tools/r4_queue8.sh > /tmp/r4_queue8.log 2>&1 &
# Queue7 aftermath:
#   1. ceiling_probe — the DEFINITIVE device constants: queue7's slope-method
#      roofline factored the linear salt out of the loop (matmul "251 TFLOP/s",
#      axpy "2119 GB/s", both above hardware spec); the probe's opaque-operand
#      salt (maximum(x, c-1e9)) forces the big op to run every iteration.
#      Whatever it prints becomes bench.py's MEASURED_TFLOPS / the journal's
#      HBM constant.
#   2. TAL top-k blockgather A/B (tal_topk_old vs tal_topk_bg) + the
#      _pow_const expansion A/B (tal_metrics vs tal_metrics_pow) at bs=64 and
#      bs=128 — flip TOPK_MODE on a win, delete on a loss.
#   3. train_bench 64 re-measure: queue7's 1318.5 ms/step (49 img/s) is a 13x
#      outlier vs the 88.8 ms queue5 number — almost certainly relay/host
#      contention; two fresh runs decide.
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue8.log docs/r4_queue8_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
timeout 2400 python tools/ceiling_probe.py
date
LOSSPROFILE_STAGES=floor,tal_metrics,tal_metrics_pow,tal_topk_old,tal_topk_bg,assigner \
  timeout 3000 python tools/loss_profile.py 64
date
LOSSPROFILE_STAGES=floor,tal_topk_old,tal_topk_bg \
  timeout 2400 python tools/loss_profile.py 128
date
timeout 2700 python tools/train_bench.py 64 1
date
timeout 2700 python tools/train_bench.py 64 1
date
echo R4_QUEUE8_DONE

#!/bin/bash
# Round-4 measurement queue 9 — run detached:
#   setsid nohup bash tools/r4_queue9.sh > /tmp/r4_queue9.log 2>&1 &
# Queue8 aftermath:
#   1. The TAL A/B stages (tal_topk_bg blockmax-gather, tal_metrics_pow) were
#      silently skipped in queue8 — they were never registered in
#      loss_profile.py's stage dict. Now registered; measure at bs=64 and 128.
#      Flip TOPK_MODE="blockgather" on a win, delete topk_blockmax_gather on a
#      loss.
#   2. assigner_bf16: ceiling check for half-width (B,M,A) assigner grids
#      (metric_dtype=bf16). If the saving is <1.5 ms it is not worth the
#      near-tie semantic risk and the knob gets deleted; if >=3 ms it becomes a
#      round-5 mAP-validated candidate.
#   3. Full bench.py run: validates the corrected-ceiling JSON keys
#      (vs_r3_constant_sol, vs_fwd_hbm_roofline) end-to-end and produces the
#      contemporaneous journal headline for the round-4 artifact comparison.
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue9.log docs/r4_queue9_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
LOSSPROFILE_STAGES=floor,assigner,assigner_bf16,tal_topk_old,tal_topk_bg,tal_metrics,tal_metrics_pow \
  timeout 3600 python tools/loss_profile.py 64
date
LOSSPROFILE_STAGES=floor,assigner,assigner_bf16,tal_topk_old,tal_topk_bg \
  timeout 3000 python tools/loss_profile.py 128
date
timeout 3600 python bench.py
date
echo R4_QUEUE9_DONE

#!/bin/bash
# Round-3 FINAL bounded measurement pass (replaces the tail of r3_queue3.sh).
# Scope is cut to what fits before round end so the chip is FREE when the
# driver's bench.py fires: backward decomposition first (it directs the
# >=1000 img/s train push), then the train batch-size sweep. The fused-stem
# probe / s2d e2e / clean headline rerun stay queued for round 4
# (tools/r3_queue3.sh) -- the driver's own bench.py produces BENCH_r03.json.
# Run on a QUIET host (no concurrent pytest/CPU work):
#   setsid nohup bash tools/r3_final.sh > /tmp/r3_final.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
# Archive the log on EXIT (an in-script cp self-truncates: everything after it
# is never captured — ADVICE r3). The trap fires after the last command.
trap 'cp /tmp/r3_final.log docs/r3_final_results.log 2>/dev/null || true' EXIT
date
timeout 900 python -c "import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print('sanity', float((x@x).sum()))" || exit 1
# 1. backward decomposition: model-only grad vs loss share, BN-stat overhead
timeout 2700 python tools/train_profile2.py
date
# 2. train batch-size sweep (inference tiling sweet spot was 128; nbs=64
#    keeps accumulate==1 either way)
timeout 2400 python tools/train_bench.py 128 1
date
timeout 2400 python tools/train_bench.py 96 1
date
echo R3_FINAL_DONE
date

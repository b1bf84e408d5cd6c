#!/bin/bash
# Round-5 measurement queue 1 — run detached:
#   setsid nohup bash tools/r5_queue1.sh > /tmp/r5_queue1.log 2>&1 &
# VERDICT r4 directives:
#   #2 reconcile the n-scale 15.25 ms e2e vs the 11.10 ms forward roofline,
#      stage by stage (tail_profile full table)
#   #3 train bs=64 campaign: post-blockgather re-measure + metric-grid bisect
#      (new tal_m_* stages) + train-forward gap bisect + remat A/B
#   #4 m-scale roofline (traffic_model m) toward the 48.6% MFU explanation
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r5_queue1.log docs/r5_queue1_results.log 2>/dev/null || true' EXIT

export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p /tmp/jax_cache

date
timeout 900 python -c 'import jax,jax.numpy as jnp; x=jax.device_put(jnp.ones((8,8))); print("sanity", float((x@x).sum()))' || { echo RELAY_DOWN; exit 1; }

date
# VERDICT #1: end-to-end mAP parity vs the reference val stack (CPU-only;
# runs first so its host load can't contaminate the timed chip stages)
[ -f /tmp/tpu_runs/overfit/weights/last.npz ] && \
  timeout 5400 python tools/parity_eval.py /tmp/tpu_runs/overfit/weights/last.npz 320 val PARITY_r05.json \
  || echo PARITY_SKIPPED

date
# inference tail: the full per-stage table at the headline shape
TAILPROFILE_STAGES=fwd,+select,+decode_blk8,full_blk8,full_suppscan,full_suppfast \
  timeout 3600 python tools/tail_profile.py 128

date
# assigner metric-grid bisect at bs=64
LOSSPROFILE_STAGES=floor,assigner,tal_metrics,tal_m_prep,tal_m_scores,tal_m_iou,tal_m_ciou,tal_topk_bg \
  timeout 3600 python tools/loss_profile.py 64

date
# train forward gap bisect + remat A/B (bs=64 amp)
timeout 3600 python tools/train_profile.py

date
# post-blockgather full-step re-measure (VERDICT #3a)
timeout 1800 python tools/train_bench.py 64 1
timeout 1800 python tools/train_bench.py 128 1

date
# m-scale int8 1.45x-vs-2x bisect (VERDICT #4): conv micro ratio, backbone
# prefix, bf16 island, NMS-tail dilution
timeout 3600 python tools/int8_profile.py m 64

date
# analytic rooflines (host-side model, no chip time)
timeout 600 python tools/traffic_model.py m 64 || true
timeout 600 python tools/traffic_model.py n 128 || true

date
# bench.py deliberately NOT run here: the inference default config is
# unchanged since r4 queue9's 8389.3 img/s; queue3 benches after the r5 flips
echo R5_QUEUE1_DONE

#!/bin/bash
# Round-4 measurement queue #4: loss-component split (directs the train-step
# loss-tail rework — the r4 levers measured ~0 e2e, so name the real costs).
# Waits for r4_queue3. Launch detached:
#   setsid nohup bash tools/r4_queue4.sh > /tmp/r4_queue4.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue4.log docs/r4_queue4_results.log 2>/dev/null || true' EXIT
for i in $(seq 1 720); do
  grep -q R4_QUEUE3_DONE /tmp/r4_queue3.log 2>/dev/null && break
  sleep 30
done
date
timeout 3600 python tools/loss_profile.py 64 20
date
echo R4_QUEUE4_DONE

#!/bin/bash
# Round-4 measurement queue #3 (runs after r4_queue2): the 0.45-SoL push.
#   1. salt_probe — cost of the image-tensor scan-chain salt vs weight-leaf
#      salt (suspected ~2.3 ms/iter of measurement apparatus inside the
#      headline number; flip gate for the bench.py salting scheme)
#   2. tail_profile — stage decomposition of the predict tail + one-hot-gather
#      variant
# Waits for r4_queue2 to release the chip (single-client exclusive relay).
# Launch detached: setsid nohup bash tools/r4_queue3.sh > /tmp/r4_queue3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
trap 'cp /tmp/r4_queue3.log docs/r4_queue3_results.log 2>/dev/null || true' EXIT
for i in $(seq 1 720); do
  grep -q R4_QUEUE2_DONE /tmp/r4_queue2.log 2>/dev/null && break
  kill -0 "$(cat /tmp/r4_queue2.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
date
timeout 2700 python tools/salt_probe.py 128 20
date
timeout 2700 python tools/tail_profile.py 128 20
date
echo R4_QUEUE3_DONE

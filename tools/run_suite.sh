#!/bin/bash
# Full-suite run with an auditable record (VERDICT r4 weak #6): writes
# docs/TESTS_rNN.txt with the exact command, pass/fail/skip counts and wall
# time. Usage: bash tools/run_suite.sh 05
set -u
cd "$(dirname "$0")/.."
N=${1:-05}
OUT=docs/TESTS_r${N}.txt
CMD="python -m pytest tests/ -q -p no:cacheprovider --durations=15"
echo "command: $CMD" > "$OUT"
echo "started: $(date -u +%FT%TZ)" >> "$OUT"
T0=$(date +%s)
$CMD 2>&1 | tail -30 > /tmp/suite_tail.txt
RC=$?
T1=$(date +%s)
echo "exit: $RC  wall: $((T1 - T0))s" >> "$OUT"
echo "--- last lines ---" >> "$OUT"
cat /tmp/suite_tail.txt >> "$OUT"
cat "$OUT"

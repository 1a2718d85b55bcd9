#!/usr/bin/env bash
# Round-4 staged TPU runs, executed serially so tunnel contention never
# overlaps: 4-Gbase spill gate -> k63 profile -> 5-gate golden re-run.
# Each stage logs to /tmp/r4_<stage>.log; a stage that fails does not
# block the next.  Protocol per CLAUDE.md: one process per stage,
# generous timeouts, exact-PID kills only (none here — timeouts bound).
set -u
cd "$(dirname "$0")/.."

echo "[batch] stage 1: 4-Gbase spill gate" >&2
DSK_TPU_SPILL_DEBUG=1 timeout 10000 python scripts/tpu_spill_guard.py \
    --bases 4096 --genome-mb 64 --max-memory-spill 288 \
    > /tmp/r4_spill4g.json 2> /tmp/r4_spill4g.log
echo "[batch] spill gate exit=$?" >&2

echo "[batch] stage 2: k63 profile" >&2
timeout 3000 python scripts/measure_k63_profile.py \
    > /tmp/r4_k63.json 2> /tmp/r4_k63.log
echo "[batch] k63 exit=$?" >&2

echo "[batch] stage 3: golden gates (refactored engine on hardware)" >&2
timeout 4000 python scripts/tpu_golden.py \
    > /tmp/r4_golden.json 2> /tmp/r4_golden.log
echo "[batch] golden exit=$?" >&2

echo "[batch] done" >&2

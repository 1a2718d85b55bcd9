#!/usr/bin/env bash
# One-shot round gate runner: every on-hardware gate in sequence,
# ONE process per gate (fresh-process D2H flake: prefer re-running a
# failed gate over debugging a hung one — CLAUDE.md).  ~15 min warm.
#
#   bash scripts/tpu_gates.sh [outdir=/tmp/tpu_gates]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_gates}
mkdir -p "$OUT"
rc=0
run() {
  name=$1; shift
  echo "=== $name ===" >&2
  if timeout 5400 python "$@" > "$OUT/$name.log" 2>&1; then
    echo "$name: OK" >&2
  else
    echo "$name: FAILED (see $OUT/$name.log)" >&2
    rc=1
  fi
  grep '"gate"' "$OUT/$name.log" | tail -2
}
run golden        scripts/tpu_golden.py
run spill_192     scripts/tpu_spill_guard.py --bases 192 --genome-mb 16
run spill_384     scripts/tpu_spill_guard.py --bases 384 --genome-mb 64
run spill_resume  scripts/tpu_spill_resume_gate.py --bases 192 --genome-mb 16
exit $rc

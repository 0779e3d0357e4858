#!/bin/bash
# Round-4 chip session 3: vmem boundary sweep, the fixed ab_packed,
# the unroll sweep, then a fresh HEAD headline with the flipped defaults.
set -u
cd "$(dirname "$0")/../.."
LOG=ABRUN.log
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
run() {
  local t=$1 label=$2; shift 2
  say "START $label: $*"
  timeout "$t" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  say "END $label (rc=$rc)"
}
export ZG2_BENCH_NO_PROBE=1

run 1800 vmem_sweep python tools/ab/vmem_sweep.py 13 16
run 2400 ab_packed2 python tools/ab/ab_packed.py 1558M 16 int4 int8
bash tools/ab/unroll_r4.sh
say "FOLLOWUP2 DONE"

#!/bin/bash
# Round-4 unroll sweep: headline_unroll12_off measured 1340 tok/s vs 1106
# at the round-2 default of 4 (same session, wmm/packed off) — find the
# right default per config before flipping it. Serial, appends ABRUN.log.
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
# HEAD defaults after the round-4 flips: wmm OFF, packed ON.
export ZG2_BENCH_NO_PROBE=1

for u in 8 12 16 32; do
  run 900 headline_u$u env ZG2_DECODE_UNROLL=$u python bench.py
done
for u in 8 12 16; do
  run 2400 flagship_b16_u$u env ZG2_DECODE_UNROLL=$u \
      python bench.py --model 1558M --quant int4 --kv-quant int8 --batch 16
done
run 2400 flagship_b1_u12 env ZG2_DECODE_UNROLL=12 \
    python bench.py --model 1558M --quant int4 --kv-quant int8
say "UNROLL SWEEP DONE"

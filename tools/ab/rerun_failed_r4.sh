#!/bin/bash
# Round-4 follow-up: the legs that failed in the first run_all session —
# ab_* died on a missing editable install (fixed: pip install -e .), and
# flagship B=1 hit a transient RESOURCE_EXHAUSTED 23 s after the previous
# process released the chip. Serial, appends to ABRUN.log.
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

run 2400 flagship_retry python bench.py --model 1558M --quant int4 --kv-quant int8
run 900 headline_unroll12_off env ZG2_WMM=0 ZG2_KV_PACKED=0 ZG2_DECODE_UNROLL=12 python bench.py
run 1200 ab_wmm python tools/ab/ab_wmm.py 124M 1
run 2400 ab_packed python tools/ab/ab_packed.py 1558M 16 int4 int8
run 1800 ab_step python tools/ab/ab_step.py 124M 1 int4 int8
run 2400 ab_extend python tools/ab/ab_extend.py 1558M int4 int8 1 512

# Honest speculative-acceptance measurement: SAME repetitive workload for
# the plain baseline and the speculative runs (bench --workload repeat).
run 2400 flagship_repeat_t0 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --workload repeat --temperature 0
run 3000 flagship_spec_ngram_repeat_t0 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --speculative ngram --spec-k 4 --workload repeat --temperature 0
run 3000 flagship_spec_ngram_repeat_t8 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --speculative ngram --spec-k 4 --workload repeat
run 1800 serve16_spec_repeat_t0 python bench.py --mode serve --batch 16 --requests 64 \
    --speculative ngram --spec-k 3 --spec-chunk 4 --workload repeat --temperature 0
run 1800 serve16_repeat_t0 python bench.py --mode serve --batch 16 --requests 64 \
    --workload repeat --temperature 0

# Step breakdown at the flagship config (VERDICT item 3).
run 1800 profile_b16 python tools/profile_step.py --model 1558M --quant int4 \
    --kv-quant int8 --batch 16 --steps 64 --top 20
say "RERUN DONE"

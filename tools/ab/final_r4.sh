#!/bin/bash
# Round-4 chip session 4: confirm the flipped defaults (wmm OFF, packed
# float-only, unroll 12) end-to-end, close the remaining open questions
# (packed vs unpacked at long ctx on the INT8 cache; the fixed vmem sweep),
# and re-profile the flagship step under the final defaults.
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

run 1800 vmem_sweep2 python tools/ab/vmem_sweep.py 13 16
run 900  headline_final python bench.py
run 2400 flagship_b16_final python bench.py --model 1558M --quant int4 --kv-quant int8 --batch 16
run 2400 flagship_b1_final python bench.py --model 1558M --quant int4 --kv-quant int8
# Long-ctx INT8: default is now UNPACKED multi-chunk; packed(+auto mc-fold)
# measured 283.8 this morning — is unpacked better or worse there?
run 2400 longctx_default python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --batch 16 --prompt-len 896 --steps 256
run 2400 longctx_packed env ZG2_KV_PACKED=1 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --batch 16 --prompt-len 896 --steps 256
# Plain 1.5B serving was never measured this round (only spec variants).
run 2400 serve16_flagship python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48
run 1800 serve16_final python bench.py --mode serve --batch 16 --requests 64
run 1800 profile_b16_final python tools/profile_step.py --model 1558M --quant int4 \
    --kv-quant int8 --batch 16 --steps 64 --top 15
say "FINAL R4 DONE"

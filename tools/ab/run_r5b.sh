#!/bin/bash
# Round-5 hardware session 2: adjudicate the session-1 findings, serially.
# Appends to ABRUN_r5.log. Run from the repo root:
#   bash tools/ab/run_r5b.sh
#
# Legs:
#  1. re-baseline the three graded rows at the NEW defaults (per-pair
#     packed quant cache now default — flipped on session-1's +7.4%)
#  2. fused-QKV A/B at 124M B=1 and 1.5B INT4 B=1 (the B=1 profiles said
#     the linear stretch is 60-67% of the step)
#  3. per-pair packed at B=1 (the flip was measured at B=16 only)
#  4. longctx UNPACKED retry (session-1 leg crashed the TPU worker)
#  5. wmm retry at the new defaults (its r04 loss was scheduling vs the
#     packed attention kernel; defaults changed since)
#  6. speculative serve: greedy repeat cross-check (r04 measured +60%) +
#     the auto-off mitigation at temperature 0.2 (should recover ~plain)
set -u
cd "$(dirname "$0")/../.."
LOG=ABRUN_r5.log
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
run() { # run <timeout_s> <label> <cmd...>
  local t=$1 label=$2; shift 2
  say "START $label: $*"
  timeout "$t" "$@" 2>&1 | tail -30 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  say "END $label (rc=$rc)"
}

say "probe (session 2)"
if ! timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'"; then
  say "TPU unreachable — aborting"; exit 1
fi
export ZG2_BENCH_NO_PROBE=1

# 1. Re-baseline at new defaults (same-day anchors for everything below).
run 900  s2_headline python bench.py
run 2400 s2_graded_b1 python bench.py --model 1558M --quant int4 --kv-quant int8
run 2400 s2_graded_b16 python bench.py --model 1558M --quant int4 --kv-quant int8 --batch 16

# 2. Fused QKV (ZG2_FUSE_QKV) — back-to-back against the anchors above.
run 900  s2_fuseqkv_124 env ZG2_FUSE_QKV=1 python bench.py
run 2400 s2_fuseqkv_1558 env ZG2_FUSE_QKV=1 python bench.py --model 1558M --quant int4 --kv-quant int8

# 3. Per-pair packed at B=1 (flip validation at the graded B=1 row).
run 2400 s2_packed_b1 python tools/ab/ab_packed.py 1558M 1 int4 int8

# 4. Long-context UNPACKED crash triage (session-1 leg killed the TPU
#    worker; r04 measured it fine at 243.5). Minimal kernel repro first
#    (one dispatch at the failing shape), then the full bench twice to
#    split transient vs real.
run 600  s2_repro_kernel python tools/repro_longctx.py 16 1159
run 600  s2_repro_kernel_stacked python tools/repro_longctx.py 16 1159 --stacked --appended
run 2400 s2_longctx_unpacked env ZG2_KV_PACKED=0 python bench.py --model 1558M \
    --quant int4 --kv-quant int8 --batch 16 --prompt-len 896 --steps 256
run 2400 s2_longctx_unpacked_retry env ZG2_KV_PACKED=0 python bench.py --model 1558M \
    --quant int4 --kv-quant int8 --batch 16 --prompt-len 896 --steps 256

# 5. wmm retry at the new defaults.
run 900  s2_wmm_124 env ZG2_WMM=1 python bench.py

# 6. Speculative serve: greedy repeat (the r04 winning workload) with the
#    raw mechanism (--spec-min-tpr 0), then the auto-off mitigation at
#    temperature 0.2 (session-1 measured raw spec 0.43x there).
run 2400 s2_spec_greedy python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --speculative ngram --spec-k 4 \
    --workload repeat --temperature 0 --spec-min-tpr 0
run 2400 s2_spec_greedy_base python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --workload repeat --temperature 0
run 2400 s2_spec_autooff_t02 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --speculative ngram --spec-k 4 \
    --workload repeat --temperature 0.2 --spec-min-tpr 1.5

# 7. Serve with the packed-quant default (session-1 serve numbers predate
#    the flip) — the ring serve anchor at the flagship config.
run 2400 s2_serve_1558 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48

say "SESSION 2 DONE"

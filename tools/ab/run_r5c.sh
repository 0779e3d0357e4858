#!/bin/bash
# Round-5 hardware session 3: finish the interrupted session-2 queue
# (run_r5b.sh died after its first leg). Appends to ABRUN_r5.log.
#   bash tools/ab/run_r5c.sh
#
# Order is by value-if-truncated: graded re-baselines first, then the
# fused-QKV A/B (the B=1 attribution said the linear stretch is 60-67%
# of the step), the dump_hlo slice audit (the 11.8% VMEM-staging
# finding), packed-at-B=1 flip validation, longctx crash triage, spec
# serve cross-checks, wmm retry, serve anchor.
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

say "probe (session 3)"
if ! timeout 120 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'"; then
  say "TPU unreachable — aborting"; exit 1
fi
export ZG2_BENCH_NO_PROBE=1

# 1. Graded re-baselines at the new defaults (per-pair packed quant KV).
run 2400 s3_graded_b1 python bench.py --model 1558M --quant int4 --kv-quant int8
run 2400 s3_graded_b16 python bench.py --model 1558M --quant int4 --kv-quant int8 --batch 16

# 2. Fused QKV (ZG2_FUSE_QKV) — against session-2's s2_headline (1377.6)
#    and the s3 anchors above.
run 900  s3_fuseqkv_124 env ZG2_FUSE_QKV=1 python bench.py
run 2400 s3_fuseqkv_1558 env ZG2_FUSE_QKV=1 python bench.py --model 1558M --quant int4 --kv-quant int8

# 3. dump_hlo slice audit at the graded B=1 config (compile-only; finds
#    the consumer of the 12-layer VMEM staging slices).
run 1200 s3_dump_hlo python tools/dump_hlo.py --model 1558M --quant int4 --kv-quant int8 --batch 1 --out /tmp/zg2_hlo_b1.txt

# 3b. Unroll sweep at the graded B=1 row: the VMEM staging is per
#     unrolled-window ([48,...]->[12,...] at unroll 12) — full unroll (48)
#     should delete the windows (indices become constants), unroll 4
#     shrinks them. r04 only swept unroll at 124M/B=1 and 1.5B/B=16.
run 2400 s3_unroll48_1558b1 env ZG2_DECODE_UNROLL=48 python bench.py --model 1558M --quant int4 --kv-quant int8
run 2400 s3_unroll4_1558b1 env ZG2_DECODE_UNROLL=4 python bench.py --model 1558M --quant int4 --kv-quant int8

# 4. Per-pair packed at B=1 (the default flip was measured at B=16 only).
run 2400 s3_packed_b1 python tools/ab/ab_packed.py 1558M 1 int4 int8

# 5. Long-context UNPACKED crash triage (session-1 leg killed the TPU
#    worker; r04 measured the same leg fine). Kernel repro first.
run 600  s3_repro_kernel python tools/repro_longctx.py 16 1159
run 600  s3_repro_kernel_stacked python tools/repro_longctx.py 16 1159 --stacked --appended
run 2400 s3_longctx_unpacked env ZG2_KV_PACKED=0 python bench.py --model 1558M \
    --quant int4 --kv-quant int8 --batch 16 --prompt-len 896 --steps 256
run 2400 s3_longctx_packed python bench.py --model 1558M \
    --quant int4 --kv-quant int8 --batch 16 --prompt-len 896 --steps 256

# 6. Speculative serve: greedy repeat raw mechanism (r04 measured +60%),
#    plain anchor, then the auto-off mitigation at temperature 0.2
#    (session-1 measured raw spec 0.43x there; auto-off should recover).
run 2400 s3_spec_greedy python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --speculative ngram --spec-k 4 \
    --workload repeat --temperature 0 --spec-min-tpr 0
run 2400 s3_spec_greedy_base python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --workload repeat --temperature 0
run 2400 s3_spec_autooff_t02 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --speculative ngram --spec-k 4 \
    --workload repeat --temperature 0.2 --spec-min-tpr 1.5

# 7. wmm retry at the new defaults (its r04 loss was scheduling vs the
#    packed attention kernel; defaults changed since).
run 900  s3_wmm_124 env ZG2_WMM=1 python bench.py

# 8. Serve anchor at the flagship config with the packed-quant default.
run 2400 s3_serve_1558 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48

say "SESSION 3 DONE"

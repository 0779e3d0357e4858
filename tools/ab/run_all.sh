#!/bin/bash
# Round-3 hardware measurement session: every pending A/B, serially (ONE
# process may own the TPU), each under a timeout so a wedged tunnel cannot
# eat the session. Appends to ABRUN.log. Run from the repo root:
#   bash tools/ab/run_all.sh [quick]
# "quick" = headline + wmm grid only (for a short tunnel window).
set -u
cd "$(dirname "$0")/../.."
LOG=ABRUN.log
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
run() { # run <timeout_s> <label> <cmd...>
  local t=$1 label=$2; shift 2
  say "START $label: $*"
  timeout "$t" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}  # the command's status, not tee's
  say "END $label (rc=$rc)"
}

say "probe"
if ! timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'"; then
  say "TPU unreachable — aborting"; exit 1
fi
# One probe for the whole session — skip bench.py's own per-run subprocess
# probe (~15 s each).
export ZG2_BENCH_NO_PROBE=1

# 1. Graded headline first (the single most important number), then the
#    same-session OFF-baseline for attribution (VERDICT item 6).
run 900 headline_HEAD python bench.py
run 900 headline_no_wmm_no_packed env ZG2_WMM=0 ZG2_KV_PACKED=0 python bench.py
run 900 headline_unroll12 env ZG2_DECODE_UNROLL=12 python bench.py

if [ "${1:-}" = quick ]; then say "quick mode done"; exit 0; fi

# 2. The three staged A/Bs.
run 1200 ab_wmm python tools/ab/ab_wmm.py 124M 1
run 2400 ab_packed python tools/ab/ab_packed.py 1558M 16 int4 int8
run 1800 ab_step python tools/ab/ab_step.py 124M 1 int4 int8

# 3. Flagship quantized decode + speculative A/B. NOTE: random weights make
#    a model-draft's stream unrelated to the target's (acceptance ~0), so
#    the HONEST hardware numbers are (a) ngram speculation — random models
#    collapse to repetition loops, so the lookup really accepts — and
#    (b) the mechanism cost: one model-draft run whose tokens_per_round ~1
#    exposes the per-round overhead (round_cost = steps/tokens_per_round
#    relative to the plain bench). Trained-weight speedups = PARITY-style
#    extrapolation from these + literature acceptance rates.
run 2400 ab_extend python tools/ab/ab_extend.py 1558M int4 int8 1 512
run 2400 flagship python bench.py --model 1558M --quant int4 --kv-quant int8
run 2400 flagship_b16 python bench.py --model 1558M --quant int4 --kv-quant int8 --batch 16
# Long-ctx (S=1152, multi-chunk attention): packed halves the kernel's f32
# temporaries, which may re-admit bc>1 there (ZG2_ATTN_MC_FOLD) — the two
# round-2 OOM readings predate the packed layout. Expect possible rc!=0
# (scoped-VMEM OOM) on the MC_FOLD leg; that is the measurement.
run 2400 flagship_longctx python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --batch 16 --prompt-len 896 --steps 256
run 2400 flagship_longctx_mcfold env ZG2_ATTN_MC_FOLD=1 \
    python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --batch 16 --prompt-len 896 --steps 256
run 3000 flagship_spec_ngram python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --speculative ngram --spec-k 4
run 3000 flagship_spec_draft python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --speculative 124M --spec-quant int4 --spec-k 4
run 3000 flagship_spec_draft_packed env ZG2_SPEC_DRAFT_PACKED=1 \
    python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --speculative 124M --spec-quant int4 --spec-k 4
run 1200 headline_spec_ngram python bench.py --speculative ngram --spec-k 4

# 4. Streaming + serve (VERDICT items 4-5 measurements).
run 900 stream_chunk1 python bench.py --mode stream --stream-chunk 1 --steps 64
run 900 stream_chunk8 python bench.py --mode stream --stream-chunk 8 --steps 64
run 900 stream_spec_ngram python bench.py --mode stream --speculative ngram --spec-k 4 --steps 64
run 1800 serve16 python bench.py --mode serve --batch 16 --requests 64
run 1800 serve16_prefix python bench.py --mode serve --batch 16 --requests 64 --prefix-len 48
run 1800 serve16_prefix_off python bench.py --mode serve --batch 16 --requests 64 \
    --prefix-len 48 --no-prefix-cache
run 1800 serve16_spec_ngram python bench.py --mode serve --batch 16 --requests 64 \
    --speculative ngram --spec-k 3
run 1800 serve16_spec_chunk4 python bench.py --mode serve --batch 16 --requests 64 \
    --speculative ngram --spec-k 3 --spec-chunk 4
run 2400 serve16_spec_flagship python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --speculative ngram --spec-k 3

# 5. TPU-only kernel tests (native PRNG sampling).
run 1200 tpu_tests env ZG2_TEST_TPU=1 python -m pytest tests/test_sampling_kernel.py -q

say "ALL DONE"

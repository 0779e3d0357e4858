#!/bin/bash
# Round-5 hardware measurement session: serial (ONE process owns the TPU),
# each leg under a timeout so a wedged tunnel cannot eat the session.
# Appends to ABRUN_r5.log. Run from the repo root:
#   bash tools/ab/run_r5.sh [quick]
# "quick" = headline + graded rows only.
#
# Measures, in order of VERDICT r04 priority:
#  1. same-day headline + the GRADED metric rows (ms/token + GB/s fields,
#     captured as JSON lines in GRADED_r05.json via bench --out)
#  2. per-PAIR packed INT8-cache fence (vmem_sweep) + A/B at ctx 192 and 1152
#  3. RING-cache serving A/B + hlo_stats serve profiles (cache-append %)
#  4. post-flip 124M B=1 + flagship B=1 step profiles
#  5. prefill profile + prefill bench
#  6. wide speculative serve (the lifted 64-row bound: B16 x (k=4 -> 80 rows))
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

say "probe"
if ! timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'"; then
  say "TPU unreachable — aborting"; exit 1
fi
export ZG2_BENCH_NO_PROBE=1

# 1. Same-day headline + graded rows.
run 900 headline_HEAD python bench.py --out GRADED_r05.json
run 2400 graded_1558_b1 python bench.py --model 1558M --quant int4 --kv-quant int8 --out GRADED_r05.json
run 2400 graded_1558_b16 python bench.py --model 1558M --quant int4 --kv-quant int8 --batch 16 --out GRADED_r05.json

if [ "${1:-}" = quick ]; then say "quick mode done"; exit 0; fi

# 2. Per-pair packed INT8 cache (VERDICT item 1).
run 1800 vmem_sweep_pair python tools/ab/vmem_sweep.py 13 16
run 2400 ab_packed_pair python tools/ab/ab_packed.py 1558M 16 int4 int8
run 2400 longctx_unpacked env ZG2_KV_PACKED=0 python bench.py --model 1558M \
    --quant int4 --kv-quant int8 --batch 16 --prompt-len 896 --steps 256
run 2400 longctx_packed env ZG2_KV_PACKED=1 python bench.py --model 1558M \
    --quant int4 --kv-quant int8 --batch 16 --prompt-len 896 --steps 256

# 3. Ring serving A/B (VERDICT item 2) + serve profiles.
run 1800 serve16_ring python bench.py --mode serve --batch 16 --requests 64
run 1800 serve16_linear env ZG2_RING=0 python bench.py --mode serve --batch 16 --requests 64
run 2400 serve16_1558_ring python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48
run 2400 serve16_1558_linear env ZG2_RING=0 python bench.py --model 1558M --quant int4 \
    --kv-quant int8 --mode serve --batch 16 --requests 48
run 2400 profile_serve_ring python tools/profile_step.py --model 1558M --batch 16 --mode serve
run 2400 profile_serve_linear env ZG2_RING=0 python tools/profile_step.py --model 1558M \
    --batch 16 --mode serve

# 4. Step profiles: the post-flip 124M B=1 headline + flagship B=1.
run 1800 profile_124_b1 python tools/profile_step.py --model 124M --quant none \
    --kv-quant none --batch 1 --steps 128
run 2400 profile_1558_b1 python tools/profile_step.py --model 1558M --batch 1

# 5. Prefill (VERDICT item 7).
run 1800 prefill_1558 python bench.py --model 1558M --quant int4 --mode prefill \
    --batch 16 --prompt-len 512
run 2400 profile_prefill python tools/profile_step.py --model 1558M --batch 16 \
    --prompt-len 512 --mode prefill

# 6. Wide speculative serve (lifted GEMV bound): k=4 at 16 slots = 80-row
#    verify windows, vs the same-workload plain serve.
run 2400 serve16_spec_k4 python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --speculative ngram --spec-k 4 \
    --workload repeat --temperature 0.2
run 2400 serve16_spec_base python bench.py --model 1558M --quant int4 --kv-quant int8 \
    --mode serve --batch 16 --requests 48 --workload repeat --temperature 0.2

# 7. TPU-only kernel tests (native PRNG sampling).
run 1200 tpu_tests env ZG2_TEST_TPU=1 python -m pytest tests/test_sampling_kernel.py -q

say "ALL DONE"

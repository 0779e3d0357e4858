"""Decode benchmark — prints ONE JSON line.

Workload: GPT-2 124M, batch=1, KV-cached temp-0.8 sampling decode — the
reference's headline workload (README.md:2, ~28 ms/token on CPU = the
vs_baseline denominator), run in bf16 with the whole token loop on device
(lax.scan in InferenceEngine.generate_scan).

Run on the real chip: ``python bench.py`` (do not run while another process
holds the TPU). Extra knobs: --model, --batch, --steps, --dtype, --quant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _probe_backend(timeout_s: float = 150.0) -> str | None:
    """Return None if the JAX backend answers, else a short reason string.

    Runs the device query in a SUBPROCESS under a timeout because a wedged
    axon tunnel makes ``jax.devices()`` hang in-process for tens of minutes
    (BENCHMARKS.md). The subprocess exits before we initialize our own
    backend, so the one-process-per-TPU rule is respected.
    """
    import subprocess

    code = (
        "from zig_gpt2_tpu.utils.platform import apply_platform_override; "
        "apply_platform_override(); "
        "import jax; d = jax.devices(); print(d[0].platform)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return "backend-probe-timeout"
    if r.returncode != 0:
        tail = (r.stderr.strip().splitlines() or ["?"])[-1]
        return "backend-init-failed: " + tail[:200]
    return None


def _backend_initialized() -> bool:
    """True when a jax backend already exists in THIS process (the
    in-process test path) — a subprocess probe would not inherit
    programmatic jax.config platform overrides, and an initialized
    backend means device access already succeeded anyway. Merely having
    ``jax`` in sys.modules is NOT enough: the package imports pull it in
    without touching any device."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def _make_prompts(args, vocab_size, rng):
    """(B, prompt_len) int32 prompts for --workload random|repeat."""
    import numpy as np

    if args.workload == "repeat":
        phrase = rng.integers(0, vocab_size, 16)
        reps = -(-args.prompt_len // 16)
        row = np.tile(phrase, reps)[: args.prompt_len]
        return np.tile(row, (args.batch, 1)).astype(np.int32)
    return rng.integers(0, vocab_size,
                        (args.batch, args.prompt_len)).astype(np.int32)


def _tag(args) -> str:
    """Metric-name suffix for non-default workload/temperature so labeled
    runs can't be mistaken for the standard benchmark."""
    t = ""
    if args.workload != "random":
        t += f"_{args.workload}"
    if args.temperature != 0.8:
        t += f"_t{args.temperature:g}"
    return t


def _emit_failure(reason: str) -> None:
    """One parseable JSON line instead of a traceback (VERDICT r03 item 5)."""
    print(json.dumps({
        "metric": "bench_failed", "value": 0, "unit": "tokens/sec",
        "vs_baseline": 0, "ok": False, "reason": reason,
    }))


def _param_bytes(params) -> int:
    """Total parameter bytes as stored (quantized leaves count their packed
    size) — the weight traffic one decode step must stream from HBM."""
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(params) if hasattr(x, "dtype"))


def _emit(line: dict, out_path: str | None) -> None:
    """Print the scoreboard line; optionally append it to a JSON-lines
    artifact (run_all.sh uses this to capture the graded flagship row —
    VERDICT r04 item 5)."""
    s = json.dumps(line)
    print(s)
    if out_path:
        with open(out_path, "a") as f:
            f.write(s + "\n")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="124M")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--quant", default=None, choices=["int8", "int4", "w8a8"])
    p.add_argument("--kv-quant", default=None, choices=["int8"])
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--mode", default="decode",
                   choices=["decode", "prefill", "serve", "stream"],
                   help="decode: KV-cached token loop (default); prefill: "
                        "whole-prompt throughput; serve: continuous-batching "
                        "scheduler with mixed-length requests; stream: "
                        "host-visible streaming via generate_iter (the CLI "
                        "path — measures the per-chunk host sync cost; "
                        "--stream-chunk to vary it)")
    p.add_argument("--stream-chunk", type=int, default=None,
                   help="decode_chunk for --mode stream (default: engine "
                        "default — 8 on TPU, 1 elsewhere)")
    p.add_argument("--requests", type=int, default=64,
                   help="request count for --mode serve")
    p.add_argument("--decode-chunk", type=int, default=8,
                   help="on-device decode steps per host sync (--mode serve)")
    p.add_argument("--speculative", default=None, metavar="DRAFT",
                   help="speculative decoding: DRAFT model name (e.g. 124M) "
                        "— or 'ngram' for draft-free prompt lookup — "
                        "proposes --spec-k tokens per round, the --model "
                        "target verifies them in one multi-token pass "
                        "(runtime/speculative.py; --mode decode, no --mesh)")
    p.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens per speculative round")
    p.add_argument("--spec-chunk", type=int, default=1,
                   help="speculative serve: rounds per host sync "
                        "(--mode serve --speculative ngram)")
    p.add_argument("--spec-min-tpr", type=float, default=0.0,
                   help="speculative serve: tokens-per-round AUTO-OFF "
                        "threshold (batcher spec_min_tpr). Bench default "
                        "0 = disabled, so A/B runs measure the raw spec "
                        "mechanism; production default is 1.5")
    p.add_argument("--prefix-len", type=int, default=0,
                   help="serve: every request's prompt starts with a "
                        "shared N-token prefix, registered in the prefix "
                        "cache (suffix-only admissions)")
    p.add_argument("--no-prefix-cache", action="store_true",
                   help="with --prefix-len: same shared-prefix workload "
                        "WITHOUT registering it (the A/B baseline)")
    p.add_argument("--workload", default="random",
                   choices=["random", "repeat"],
                   help="prompt construction: random ids (default) or a "
                        "16-token phrase tiled to --prompt-len — the "
                        "repetitive/quoting traffic where prompt-lookup "
                        "speculation actually accepts (label the run!)")
    p.add_argument("--temperature", type=float, default=0.8,
                   help="sampling temperature (0 = greedy; the honest "
                        "speculative-acceptance measurement pairs "
                        "--workload repeat with low temperature)")
    p.add_argument("--spec-quant", default=None,
                   choices=["int8", "int4"],
                   help="weight quantization for the DRAFT model")
    p.add_argument("--spec-kv-quant", default=None, choices=["int8"],
                   help="KV-cache quantization for the DRAFT model")
    p.add_argument("--mesh", default=None, metavar="DPxTP",
                   help="run sharded over a (data, model) mesh, e.g. 1x8 — "
                        "the scaling benchmark (BENCHMARKS.md); requires "
                        "dp*tp devices")
    p.add_argument("--seq-parallel", action="store_true",
                   help="prefill sequence parallelism over the model axis "
                        "(with --mesh; the SP experiment, SURVEY §2.3)")
    p.add_argument("--out", default=None, metavar="FILE",
                   help="also append the JSON line to FILE (run_all.sh "
                        "captures the graded flagship row this way)")
    args = p.parse_args()

    from zig_gpt2_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # ZG2_PLATFORM=cpu for off-chip smoke runs

    # Probe the backend in a subprocess BEFORE touching it here: an
    # unreachable TPU must yield a structured scoreboard line, not a
    # 30-line traceback (BENCH_r03 was rc=1 with parsed:null).
    # Skipped when jax is already imported in THIS process (the in-process
    # test path — a subprocess wouldn't inherit programmatic jax.config
    # platform overrides) or via ZG2_BENCH_NO_PROBE=1 (tight A/B loops).
    if (os.environ.get("ZG2_BENCH_NO_PROBE", "0") != "1"
            and not _backend_initialized()):
        reason = _probe_backend()
        if reason is not None:
            # Same contract as the __main__ handler: parseable line AND a
            # nonzero exit, whichever layer detects the outage.
            _emit_failure(reason)
            sys.exit(1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zig_gpt2_tpu.config import SamplingConfig, get_config
    from zig_gpt2_tpu.models import gpt2
    from zig_gpt2_tpu.runtime.engine import InferenceEngine

    config = get_config(args.model)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    wmode = "int8" if args.quant == "w8a8" else args.quant
    mesh = None
    if args.mesh:
        from zig_gpt2_tpu.parallel import distributed as pdist
        from zig_gpt2_tpu.parallel import mesh as pmesh
        from zig_gpt2_tpu.parallel import sharding as psh

        # Before ANY device use (init_params below initializes the
        # backend; after that the XLA flags are silently ignored).
        pdist.enable_collective_overlap()
        dp, tp = (int(x) for x in args.mesh.split("x"))
        mesh = pmesh.make_mesh(dp, tp)
    params = gpt2.init_params(config, jax.random.PRNGKey(0), dtype=dtype)
    if args.mesh:
        # cli.py order: pad -> quantize(tp) -> shard (prepare_params inside
        # the engine/batcher places the leaves).
        params, config = psh.pad_for_tp(params, config, tp)
        if args.quant:
            from zig_gpt2_tpu.quant import quantize as q

            params = q.quantize_params(params, mode=wmode, tp=tp)
        params, config = pmesh.prepare_params(params, config, mesh)
        if args.seq_parallel:
            import dataclasses

            config = dataclasses.replace(config, seq_parallel=True)
    elif args.quant:
        from zig_gpt2_tpu.quant import quantize as q

        params = q.quantize_params(params, mode=wmode)
    if args.quant == "w8a8":
        import dataclasses

        config = dataclasses.replace(config, act_quant=True)

    if args.speculative and args.mode == "serve":
        # Serve-mode speculation is draft-free prompt lookup inside the
        # batcher (runtime/batcher.py _step_spec) — handled below. Works
        # under --mesh too (GSPMD partitions the extend-based round).
        if args.speculative != "ngram":
            raise SystemExit("--mode serve --speculative supports only "
                             "'ngram' (draft-free prompt lookup)")
    elif args.speculative:
        if args.mesh or args.mode not in ("decode", "stream"):
            raise SystemExit("--speculative is --mode decode/stream/serve, "
                             "no --mesh (v1)")
        from zig_gpt2_tpu.runtime.speculative import SpeculativeEngine

        if args.speculative == "ngram":
            dconfig = dparams = None  # draft-free prompt lookup
        else:
            dconfig = get_config(args.speculative)
            dparams = gpt2.init_params(dconfig, jax.random.PRNGKey(1),
                                       dtype=dtype)
            if args.spec_quant:
                from zig_gpt2_tpu.quant import quantize as q

                dparams = q.quantize_params(dparams, mode=args.spec_quant)
        spec = SpeculativeEngine(
            config, params, dconfig, dparams, k=args.spec_k,
            batch_size=args.batch, max_seq=args.prompt_len + args.steps,
            prompt_buckets=(args.prompt_len,), kv_quant=args.kv_quant,
            draft_kv_quant=args.spec_kv_quant,
        )
        sampling = SamplingConfig(temperature=args.temperature, seed=0)
        rng = np.random.default_rng(0)
        prompts = _make_prompts(args, config.vocab_size, rng)
        lengths = [args.prompt_len] * args.batch

        if args.mode == "stream":
            # Host-visible speculative streaming: one sync per ROUND (the
            # speculative analogue of --stream-chunk; on a tunneled chip
            # each sync costs ~35 ms, amortized over the accepted tokens).
            if args.batch != 1:
                raise SystemExit("--mode stream is single-sequence")
            from zig_gpt2_tpu.runtime.engine import GenerationMetrics

            ids = list(prompts[0])

            def run_stream():
                m = GenerationMetrics()
                out = list(spec.generate_iter(ids, args.steps, sampling,
                                              metrics=m))
                assert len(out) == args.steps
                return m

            run_stream()  # warmup/compile
            best, rounds, best_m = 0.0, None, None
            for _ in range(args.repeats):
                m = run_stream()
                tps = m.tokens_per_sec
                if tps > best:
                    best, rounds, best_m = tps, spec.last_rounds, m
            _emit({
                "metric": f"gpt2_{args.model}_{args.dtype}"
                + (f"_{args.quant}" if args.quant else "")
                + (f"_kv{args.kv_quant}" if args.kv_quant else "")
                + f"_spec{args.speculative}_k{args.spec_k}"
                + _tag(args)
                + "_stream_tokens_per_sec",
                "value": round(best, 2),
                "unit": "tokens/sec",
                "vs_baseline": round(best / (1000.0 / 28.0), 2),
                "tokens_per_round": round(args.steps / max(rounds or 1, 1), 2),
                "ms_per_token_p50": round(
                    best_m.ms_per_token_percentile(50), 3),
            }, args.out)
            return

        spec.generate_scan(prompts, lengths, args.steps, sampling)  # compile
        best, rounds = float("inf"), None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = spec.generate_scan(prompts, lengths, args.steps, sampling)
            dt = time.perf_counter() - t0
            if dt < best:
                best, rounds = dt, spec.last_rounds
            assert out.shape == (args.batch, args.steps)
        tps = args.batch * args.steps / best
        _emit({
            "metric": f"gpt2_{args.model}_{args.dtype}"
            + (f"_{args.quant}" if args.quant else "")
            + (f"_kv{args.kv_quant}" if args.kv_quant else "")
            + f"_spec{args.speculative}_k{args.spec_k}"
            + _tag(args)
            + f"_decode_b{args.batch}_tokens_per_sec",
            "value": round(tps, 2),
            "unit": "tokens/sec",
            "vs_baseline": round(tps / (1000.0 / 28.0), 2),
            "tokens_per_round": round(args.steps / max(rounds, 1), 2),
            "ms_per_token": round(1000.0 * best / args.steps, 3),
        }, args.out)
        return

    engine = InferenceEngine(
        config, params, batch_size=args.batch,
        max_seq=args.prompt_len + args.steps,
        prompt_buckets=(args.prompt_len,),
        kv_quant=args.kv_quant,
        mesh=mesh,
        decode_chunk=args.stream_chunk,
    )
    sampling = SamplingConfig(temperature=args.temperature, seed=0)
    rng = np.random.default_rng(0)
    prompts = _make_prompts(args, config.vocab_size, rng)
    lengths = [args.prompt_len] * args.batch

    if args.mode == "serve":
        from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

        spec_kw = {}
        if args.speculative:
            # Rounds replace chunking: --spec-chunk N runs N rounds per
            # sync, each committing up to spec_k+1 tokens. (NOT inherited
            # from --decode-chunk — its default of 8 would silently make
            # the unlabeled spec runs the MORE-chunked variant.)
            spec_kw = dict(speculative="ngram", spec_k=args.spec_k,
                           spec_chunk=args.spec_chunk,
                           spec_min_tpr=args.spec_min_tpr)
            args.decode_chunk = 1

        from zig_gpt2_tpu.runtime.batcher import BatcherMetrics

        # ONE batcher reused across repetitions (a drained batcher accepts
        # new submissions; admissions reset slot state): fresh-batcher-per-
        # rep meant fresh jit closures, so every repetition recompiled and
        # the first sync's wall time was compile, not serving.
        batcher = ContinuousBatcher(
            config, params, batch_size=args.batch,
            max_seq=args.prompt_len + args.steps,
            prompt_buckets=(args.prompt_len,),
            sampling=SamplingConfig(temperature=args.temperature, seed=0),
            kv_quant=args.kv_quant,
            decode_chunk=args.decode_chunk,
            mesh=mesh,
            **spec_kw,
        )

        shared_prefix = []
        if args.prefix_len:
            if args.prefix_len >= args.prompt_len:
                raise SystemExit("--prefix-len must be < --prompt-len")
            pr = np.random.default_rng(7)
            shared_prefix = list(pr.integers(0, config.vocab_size,
                                             args.prefix_len))
            if not args.no_prefix_cache:
                batcher.register_prefix(shared_prefix)

        def run_serve():
            batcher.metrics = BatcherMetrics()
            r = np.random.default_rng(1)
            for _ in range(args.requests):
                lo = max(args.prefix_len + 1, args.prompt_len // 2)
                n = int(r.integers(lo, args.prompt_len))
                if args.workload == "repeat":
                    phrase = r.integers(0, config.vocab_size, 16)
                    reps = -(-(n - args.prefix_len) // 16)
                    suffix = list(np.tile(phrase, reps)[: n - args.prefix_len])
                else:
                    suffix = list(
                        r.integers(0, config.vocab_size, n - args.prefix_len))
                prompt = shared_prefix + suffix
                batcher.submit(
                    prompt,
                    max_new_tokens=int(r.integers(args.steps // 2, args.steps)),
                )
            t0 = time.perf_counter()
            done = batcher.run()
            wall = time.perf_counter() - t0
            toks = sum(len(q.generated) for q in done)
            return toks / wall, batcher.metrics

        run_serve()  # warmup/compile
        best, metrics = 0.0, None
        for _ in range(args.repeats):
            tps, m = run_serve()
            if tps > best:
                best, metrics = tps, m
        line = {
            "metric": f"gpt2_{args.model}_{args.dtype}"
            + (f"_{args.quant}" if args.quant else "")
            + (f"_kv{args.kv_quant}" if args.kv_quant else "")
            + (f"_spec{args.speculative}_k{args.spec_k}"
               if args.speculative else "")
            + (f"_chunk{args.spec_chunk}"
               if args.speculative and args.spec_chunk > 1 else "")
            + (f"_prefix{args.prefix_len}" if args.prefix_len else "")
            + ("_nocache" if args.prefix_len and args.no_prefix_cache else "")
            + _tag(args)
            + f"_serve_slots{args.batch}_tokens_per_sec",
            "value": round(best, 2),
            "unit": "tokens/sec",
            "vs_baseline": round(best / (1000.0 / 28.0), 2),
            "slot_utilization": round(metrics.slot_utilization(args.batch), 3),
            "sync_ms_p50": round(metrics.sync_ms_percentile(50), 2),
            "sync_ms_p99": round(metrics.sync_ms_percentile(99), 2),
        }
        if args.speculative:
            line["tokens_per_round"] = round(metrics.tokens_per_round, 2)
        if args.prefix_len:
            # Admission wall time is what the prefix cache buys.
            line["prefill_s"] = round(metrics.prefill_s, 3)
            line["prefix_hits"] = metrics.prefix_hits
        _emit(line, args.out)
        return

    if args.mode == "stream":
        # Host-visible streaming: every token crosses the host boundary
        # (the CLI/interactive path). On a tunneled chip each sync costs
        # ~35 ms, so this is dominated by decode_chunk — the VERDICT
        # round-2 chunked-streaming measurement.
        if args.batch != 1:
            raise SystemExit("--mode stream is single-sequence (--batch 1)")
        from zig_gpt2_tpu.runtime.engine import GenerationMetrics

        ids = list(prompts[0])

        def run_stream():
            m = GenerationMetrics()
            out = list(engine.generate_iter(ids, args.steps, sampling,
                                            metrics=m))
            assert len(out) == args.steps
            return m

        run_stream()  # warmup/compile
        best, best_m = 0.0, None
        for _ in range(args.repeats):
            m = run_stream()
            if m.tokens_per_sec > best:
                best, best_m = m.tokens_per_sec, m
        _emit({
            "metric": f"gpt2_{args.model}_{args.dtype}"
            + (f"_{args.quant}" if args.quant else "")
            + (f"_kv{args.kv_quant}" if args.kv_quant else "")
            + _tag(args)
            + f"_stream_chunk{engine.decode_chunk}_tokens_per_sec",
            "value": round(best, 2),
            "unit": "tokens/sec",
            "vs_baseline": round(best / (1000.0 / 28.0), 2),
            "ms_per_token_p50": round(best_m.ms_per_token_percentile(50), 3),
        }, args.out)
        return

    if args.mode == "prefill":
        toks = jnp.asarray(prompts)
        lens = jnp.asarray(lengths, jnp.int32)

        def run_prefill():
            _, logits = engine._prefill(engine.params, engine.new_cache(), toks, lens)
            return np.asarray(logits)  # host sync

        run_prefill()  # warmup/compile
        best_s = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run_prefill()
            best_s = min(best_s, time.perf_counter() - t0)
        tokens_per_sec = args.batch * args.prompt_len / best_s
        _emit({
            "metric": f"gpt2_{args.model}_{args.dtype}"
            + (f"_{args.quant}" if args.quant else "")
            + f"_prefill_b{args.batch}_t{args.prompt_len}_tokens_per_sec",
            "value": round(tokens_per_sec, 2),
            "unit": "tokens/sec",
            # Reference prefill = one full forward per prompt token at
            # ~28ms each (no batched prefill exists there).
            "vs_baseline": round(tokens_per_sec / (1000.0 / 28.0), 2),
        }, args.out)
        return

    # Warmup (compiles prefill + scan loop).
    engine.generate_scan(prompts, lengths, args.steps, sampling)

    best_ms_per_token = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = engine.generate_scan(prompts, lengths, args.steps, sampling)
        dt = time.perf_counter() - t0
        best_ms_per_token = min(best_ms_per_token, dt * 1000.0 / args.steps)
        assert out.shape == (args.batch, args.steps)

    tokens_per_sec = 1000.0 / best_ms_per_token * args.batch
    # Reference baseline: ~28 ms/token (BASELINE.md).
    # weight_stream_gbps: achieved weight-streaming rate = bytes of stored
    # params per step x steps/s — a chip-drift normalizer next to tok/s
    # (the chip swings ~25% day to day, BENCHMARKS.md; this field moves
    # with it, so a slow-chip day reads as low GB/s, not a regression).
    steps_per_sec = 1000.0 / best_ms_per_token
    _emit(
        {
            "metric": f"gpt2_{args.model}_{args.dtype}"
            + (f"_{args.quant}" if args.quant else "")
            + (f"_kv{args.kv_quant}" if args.kv_quant else "")
            + (f"_mesh{args.mesh}" if args.mesh else "")
            + _tag(args)
            + f"_decode_b{args.batch}_tokens_per_sec",
            "value": round(tokens_per_sec, 2),
            "unit": "tokens/sec",
            "vs_baseline": round(tokens_per_sec / (1000.0 / 28.0), 2),
            # The graded pair (BASELINE.md): per-token latency is the step
            # time (each lane gets one token per step; best over repeats —
            # the scan path cannot see per-token p50, see --mode stream
            # for the host-visible percentile).
            "ms_per_token": round(best_ms_per_token, 3),
            "weight_stream_gbps": round(
                _param_bytes(engine.params) * steps_per_sec / 1e9, 1),
        },
        args.out,
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — scoreboard must stay parseable
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_failure(f"{type(e).__name__}: {e}"[:300])
        sys.exit(1)

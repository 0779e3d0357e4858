"""hlo_stats step breakdown for the decode loop (VERDICT r03 item 3).

Builds an InferenceEngine like bench.py, traces a few decode chunks with
jax.profiler, converts the xspace with xprof's hlo_stats tool, and prints
the top ops by self time plus a category rollup (attention kernel, qmm,
wmm, sampling, fusions, ...). Works on CPU for plumbing tests; the real
numbers need the chip (run serially — ONE process owns the TPU).

Usage:
    python tools/profile_step.py --model 1558M --quant int4 --kv-quant int8 \
        --batch 16 [--steps 64] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _category(name: str, program: str) -> str:
    s = (name + " " + program).lower()
    if "attention" in s or "flash" in s:
        return "attention-kernel"
    if "qmm" in s:
        return "qmm"
    if "wmm" in s:
        return "wmm"
    if "gumbel" in s or "sample" in s or "sampling" in s:
        return "sampling"
    if "dynamic-update-slice" in s or "dynamic_update_slice" in s:
        return "cache-append"
    if "custom-call" in s:
        return "custom-call-other"
    if "fusion" in s:
        return "xla-fusion"
    if "copy" in s or "bitcast" in s:
        return "copy/format"
    if "while" in s:
        return "loop-overhead"
    if "dot" in s or "conv" in s:
        return "matmul"
    return "other"


def _rows_from_tool_data(data) -> list[dict]:
    """hlo_stats tool output -> list of dicts, format-agnostic.

    xprof returns either a JSON gviz DataTable ({"cols": [...], "rows":
    [{"c": [{"v": ...}]}]}) or raw CSV depending on version; handle both
    and fall back to dumping the head of whatever came back.
    """
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    data = data.strip()
    if data.startswith("{") or data.startswith("["):
        obj = json.loads(data)
        if isinstance(obj, dict) and "rows" in obj and "cols" in obj:
            labels = [c.get("label") or c.get("id") for c in obj["cols"]]
            out = []
            for r in obj["rows"]:
                vals = [c.get("v") if isinstance(c, dict) else c
                        for c in r["c"]]
                out.append(dict(zip(labels, vals)))
            return out
        if isinstance(obj, list) and obj and isinstance(obj[0], dict):
            return obj
        raise ValueError(f"unrecognized JSON shape: {str(obj)[:200]}")
    # CSV fallback
    import csv
    import io

    return list(csv.DictReader(io.StringIO(data)))


def _pick(row: dict, *cands: str):
    low = {k.lower().replace(" ", "_"): v for k, v in row.items()}
    for c in cands:
        if c in low:
            return low[c]
    return None


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="1558M")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--quant", default="int4", choices=["none", "int8", "int4"])
    p.add_argument("--kv-quant", default="int8", choices=["none", "int8"])
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--keep", default=None, metavar="DIR",
                   help="keep the raw trace in DIR (default: tempdir)")
    p.add_argument("--mode", default="decode",
                   choices=["decode", "serve", "prefill"],
                   help="decode: engine generate_scan (uniform positions); "
                        "serve: ContinuousBatcher with MIXED-length "
                        "requests (divergent slot positions — the "
                        "cache-append tax / ring A/B view); prefill: one "
                        "whole-prompt pass (the MFU question)")
    p.add_argument("--requests", type=int, default=48,
                   help="request count for --mode serve")
    p.add_argument("--decode-chunk", type=int, default=8,
                   help="decode chunk for --mode serve")
    args = p.parse_args()

    from zig_gpt2_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zig_gpt2_tpu.config import SamplingConfig, get_config
    from zig_gpt2_tpu.models import gpt2
    from zig_gpt2_tpu.runtime.engine import InferenceEngine

    config = get_config(args.model)
    params = gpt2.init_params(config, jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16)
    if args.quant != "none":
        from zig_gpt2_tpu.quant import quantize as q

        params = q.quantize_params(params, mode=args.quant)
    sampling = SamplingConfig(temperature=0.8, seed=0)
    rng = np.random.default_rng(0)
    kv_quant = None if args.kv_quant == "none" else args.kv_quant
    trace_dir = args.keep or tempfile.mkdtemp(prefix="zg2prof_")

    if args.mode == "serve":
        from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

        batcher = ContinuousBatcher(
            config, params, batch_size=args.batch,
            max_seq=args.prompt_len + args.steps,
            prompt_buckets=(args.prompt_len,), sampling=sampling,
            kv_quant=kv_quant, decode_chunk=args.decode_chunk,
        )

        def submit_all(seed):
            r = np.random.default_rng(seed)
            for _ in range(args.requests):
                n = int(r.integers(max(args.prompt_len // 2, 1),
                                   args.prompt_len))
                batcher.submit(list(r.integers(0, config.vocab_size, n)),
                               max_new_tokens=int(
                                   r.integers(args.steps // 2, args.steps)))

        submit_all(1)
        batcher.run()  # warmup/compile
        submit_all(2)
        with jax.profiler.trace(trace_dir):
            batcher.run()
    else:
        engine = InferenceEngine(
            config, params, batch_size=args.batch,
            max_seq=args.prompt_len + args.steps,
            prompt_buckets=(args.prompt_len,),
            kv_quant=kv_quant,
        )
        prompts = rng.integers(0, config.vocab_size,
                               (args.batch, args.prompt_len)).astype(np.int32)
        lengths = [args.prompt_len] * args.batch

        if args.mode == "prefill":
            toks = jnp.asarray(prompts)
            lens = jnp.asarray(lengths, jnp.int32)
            _, lg = engine._prefill(engine.params, engine.new_cache(),
                                    toks, lens)
            np.asarray(lg)  # warmup/compile + tunnel-safe sync
            with jax.profiler.trace(trace_dir):
                _, lg = engine._prefill(engine.params, engine.new_cache(),
                                        toks, lens)
                np.asarray(lg)
        else:
            # Warmup: compile prefill + the decode scan.
            np.asarray(engine.generate_scan(prompts, lengths, args.steps,
                                            sampling))
            with jax.profiler.trace(trace_dir):
                out = engine.generate_scan(prompts, lengths, args.steps,
                                           sampling)
                np.asarray(out)  # tunnel-safe sync (block_until_ready lies)

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    try:
        rows = _rows_from_tool_data(data)
    except Exception as e:  # dump the head so the format is diagnosable
        head = (data if isinstance(data, str) else
                data.decode("utf-8", "replace"))[:2000]
        sys.exit(f"hlo_stats parse failed ({e}); head:\n{head}")

    parsed = []
    for r in rows:
        name = str(_pick(r, "hlo_op_name", "op_name", "name", "hlo_op") or "")
        program = str(_pick(r, "program_id", "hlo_module", "module",
                            "program") or "")
        cat = str(_pick(r, "hlo_op_category", "category") or "")
        t = _pick(r, "total_self_time_(us)", "self_time_(us)", "self_time_us",
                  "total_self_time", "self_time", "avg._time_(us)")
        occ = _pick(r, "#occurrences", "occurrences", "count")
        if t is None:
            continue
        try:
            t = float(t)
        except (TypeError, ValueError):
            continue
        parsed.append({"name": name, "program": program, "xla_cat": cat,
                       "self_us": t, "occ": occ,
                       "cat": _category(name, cat)})
    if not parsed:
        keys = list(rows[0].keys()) if rows else []
        sys.exit(f"no time column found; columns = {keys}")

    parsed.sort(key=lambda r: -r["self_us"])
    total = sum(r["self_us"] for r in parsed)
    steps = args.steps
    print(f"# hlo_stats: {args.model} quant={args.quant} kv={args.kv_quant} "
          f"B={args.batch} steps={steps}  total self {total/1e3:.2f} ms "
          f"({total/steps:.1f} us/step)")
    print(f"{'us/step':>9} {'%':>5}  {'cat':<18} name")
    for r in parsed[: args.top]:
        print(f"{r['self_us']/steps:9.1f} {100*r['self_us']/total:5.1f}  "
              f"{r['cat']:<18} {r['name'][:90]}")

    roll: dict[str, float] = {}
    for r in parsed:
        roll[r["cat"]] = roll.get(r["cat"], 0.0) + r["self_us"]
    print("\n# rollup")
    for cat, t in sorted(roll.items(), key=lambda kv: -kv[1]):
        print(f"{t/steps:9.1f} {100*t/total:5.1f}  {cat}")
    print(f"\n(trace kept at {trace_dir})" if args.keep
          else f"\n(trace at {trace_dir} — temp, delete when done)")


if __name__ == "__main__":
    main()

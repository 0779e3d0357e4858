"""CLI driver.

Reference interface: ``zig_gpt2 "<prompt>"`` with hardcoded temp=0.8 and the
124M config (main.zig:344-371). Same defaults here, everything configurable
(SURVEY.md §5 config system): model size, dtype, quantization, sampling,
sequence budget, mesh shape, profiling.

Examples::

    zig-gpt2-tpu "Hello, my name is"                      # needs weights
    zig-gpt2-tpu --demo "the quick brown"                  # self-contained demo
    zig-gpt2-tpu --model 355M --weights models/355M/raw \
                 --encoder-dir models/355M --quant int8 "..."
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="zig-gpt2-tpu", description=__doc__)
    p.add_argument("prompt", nargs="?", default=None, help="prompt text (argv[1], like the reference)")
    p.add_argument("--model", default="124M", help="config name: 124M/355M/774M/1558M/nano/micro")
    p.add_argument("--weights", default=None, help="raw checkpoint dir (e.g. models/124M/raw)")
    p.add_argument("--encoder-dir", default=None, help="dir holding encoder.json + vocab.bpe")
    p.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"], help="weight/activation dtype")
    p.add_argument("--quant", default=None, choices=["int8", "int4", "w8a8"],
                   help="quantization: int8/int4 weight-only, or w8a8 (per-channel INT8 weights + dynamic INT8 activations on the s8 MXU)")
    p.add_argument("--kv-quant", action="store_true", help="INT8 KV cache")
    p.add_argument("--temp", type=float, default=0.8, help="sampling temperature (reference default 0.8)")
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--top-p", type=float, default=None, help="nucleus sampling mass")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-tokens", type=int, default=None, help="default: run to the context window end, like the reference")
    p.add_argument("--stop", default=None, metavar="TOK",
                   help="stop token: an id, or 'eos' for GPT-2's <|endoftext|> "
                        "(the reference never stops — that stays the default)")
    p.add_argument("--max-seq", type=int, default=None)
    p.add_argument("--mesh", default=None, help="tensor-parallel mesh shape, e.g. '1x8' (data x model)")
    p.add_argument("--seq-parallel", action="store_true",
                   help="shard prefill activations along the sequence axis "
                        "over the model mesh axis (requires --mesh)")
    p.add_argument("--profile", default=None, metavar="DIR", help="write an XProf trace to DIR")
    p.add_argument("--metrics", action="store_true", help="print timing metrics to stderr")
    p.add_argument("--demo", action="store_true", help="random tiny model + on-the-fly tokenizer (no weights needed)")
    p.add_argument("--batch-file", default=None, metavar="FILE",
                   help="serve a file of prompts (one per line) through the "
                        "continuous-batching scheduler instead of a single prompt")
    p.add_argument("--batch-slots", type=int, default=8,
                   help="decode slots for --batch-file serving")
    p.add_argument("--prefix", default=None, metavar="TEXT",
                   help="--batch-file: register TEXT as a shared prompt "
                        "prefix (system prompt) in the KV prefix cache — "
                        "prompts starting with it admit by splicing the "
                        "stored rows and computing only their suffix")
    p.add_argument("--decode-chunk", type=int, default=None,
                   help="on-device decode steps per host sync (streaming and "
                        "batch modes; default: 8 on TPU for streaming, 1 on "
                        "CPU / batch)")
    p.add_argument("--draft-model", default=None, metavar="NAME",
                   help="speculative decoding: draft model config name "
                        "(e.g. 124M), or 'ngram' for draft-free prompt "
                        "lookup (proposals from the token history). The "
                        "draft proposes --spec-k tokens per round; the "
                        "--model target verifies them in one pass "
                        "(runtime/speculative.py). Single-prompt streaming "
                        "only; no --mesh")
    p.add_argument("--draft-weights", default=None,
                   help="draft checkpoint (raw dir or .npz); --demo uses a "
                        "random draft")
    p.add_argument("--draft-quant", default=None, choices=["int8", "int4"],
                   help="quantize the draft model's weights")
    p.add_argument("--draft-kv-quant", action="store_true",
                   help="INT8 KV cache for the draft model")
    p.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens per speculative round")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the JAX backend (or env ZG2_PLATFORM). "
                        "Plain JAX_PLATFORMS=cpu does not survive "
                        "environments whose sitecustomize pre-registers an "
                        "accelerator plugin; this sets jax.config before "
                        "any device use")
    return p


def _load_encoder(args):
    from zig_gpt2_tpu.tokenizer import Encoder

    d = Path(args.encoder_dir or f"models/{args.model}")
    enc_json, bpe = d / "encoder.json", d / "vocab.bpe"
    if not enc_json.exists():
        sys.exit(
            f"error: {enc_json} not found — run tools/download_weights.py first, "
            "or use --demo for a self-contained run"
        )
    return Encoder.from_files(enc_json, bpe if bpe.exists() else None,
                              mode="bpe" if bpe.exists() else "greedy")


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.prompt is None and args.batch_file is None:
        sys.exit("error: missing prompt (usage: zig-gpt2-tpu \"<prompt>\")")

    from zig_gpt2_tpu.utils.platform import apply_platform_override

    apply_platform_override(args.platform)

    import jax
    import jax.numpy as jnp

    from zig_gpt2_tpu.config import SamplingConfig, get_config
    from zig_gpt2_tpu.models import gpt2
    from zig_gpt2_tpu.runtime.engine import GenerationMetrics, InferenceEngine
    from zig_gpt2_tpu.utils.profiling import xprof_trace

    dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16

    mesh = None
    tp = 1
    if args.mesh:
        from zig_gpt2_tpu.parallel import distributed as pdist
        from zig_gpt2_tpu.parallel import mesh as pmesh

        # Must run before make_mesh touches devices (backend init).
        pdist.enable_collective_overlap()
        # (Multi-host pods additionally call parallel.distributed.initialize()
        # before any jax device use — deliberately NOT auto-called here:
        # single-host TPU containers often export TPU_WORKER_HOSTNAMES,
        # which would mis-trigger the multi-host path.)
        dp, tp = (int(x) for x in args.mesh.split("x"))
        mesh = pmesh.make_mesh(dp, tp)

    if args.demo:
        from zig_gpt2_tpu.config import GPTConfig
        from zig_gpt2_tpu.tokenizer import Encoder, train_bpe

        demo_text = (
            "the quick brown fox jumps over the lazy dog. "
            "hello world, streaming tokens from a tiny random model. "
        ) * 4 + (args.prompt or "")
        vocab, merges = train_bpe(demo_text, vocab_size=320)
        encoder = Encoder(vocab, merges)
        config = GPTConfig(vocab_size=len(vocab), context_size=256,
                           n_layers=2, n_heads=4, n_embed=128)
        params = gpt2.init_params(config, jax.random.PRNGKey(args.seed), dtype)
    else:
        config = get_config(args.model)
        encoder = _load_encoder(args)
        if args.weights is None:
            sys.exit("error: --weights required (or use --demo)")
        from zig_gpt2_tpu.utils import io as zio

        if str(args.weights).endswith(".npz"):
            # Pre-repacked (possibly quantized) checkpoint — tools/repack.py.
            # Like the raw branch below: under a mesh stay host-side so
            # prepare_params does the ONE placement with Megatron shardings
            # (device_put=True here would spike device 0 with the whole
            # model and transfer it twice).
            params, meta = zio.load_pytree_npz(
                args.weights, device_put=mesh is None, with_meta=True
            )
            if meta and (meta.get("padded_heads") or meta.get("padded_vocab_size")):
                # repack --tp baked the TP padding into the quantized
                # layouts; reconstruct the padded config so prepare_params
                # sees dims that already divide.
                import dataclasses

                config = dataclasses.replace(
                    config,
                    padded_heads=meta.get("padded_heads"),
                    padded_vocab_size=meta.get("padded_vocab_size"),
                )
        else:
            # Under a mesh, keep the checkpoint host-side: padding (and
            # quantization) happen before placement, and prepare_params
            # then does the ONE device_put with the Megatron shardings —
            # loading to device 0 first would double the transfer and
            # spike a single chip's HBM with the whole unpadded model.
            params = zio.load_gpt2_raw(args.weights, config, dtype=dtype,
                                       device_put=mesh is None)
        if args.quant and "lm_head" not in params:
            from zig_gpt2_tpu.quant import quantize as q

            wmode = "int8" if args.quant == "w8a8" else args.quant
            if mesh is not None:
                # Pad BEFORE quantizing so the quantized layouts (int4
                # half-split packing, scale groups) are born TP-aligned;
                # prepare_params then sees dims that already divide.
                from zig_gpt2_tpu.parallel import sharding as psh

                params, config = psh.pad_for_tp(params, config, tp)
            params = q.quantize_params(params, mode=wmode, tp=tp)

    if mesh is not None:
        # Pads (float checkpoints), sets config.spmd, and places every leaf
        # with its Megatron-style sharding; engine/batcher below see
        # config.spmd already set and reuse the placed params as-is.
        import dataclasses

        from zig_gpt2_tpu.parallel import mesh as pmesh

        params, config = pmesh.prepare_params(params, config, mesh)
        if args.seq_parallel:
            config = dataclasses.replace(config, seq_parallel=True)
    if args.quant == "w8a8":
        import dataclasses

        config = dataclasses.replace(config, act_quant=True)

    kv_quant = "int8" if args.kv_quant else None
    sampling = SamplingConfig(temperature=args.temp, top_k=args.top_k,
                              top_p=args.top_p, seed=args.seed)
    stop_tokens = []
    if args.stop is not None:
        if args.stop == "eos":
            eos = encoder.vocab.get("<|endoftext|>")
            if eos is None:
                sys.exit("error: tokenizer has no <|endoftext|> token")
            stop_tokens = [eos]
        else:
            stop_tokens = [int(args.stop)]

    # --draft-model ngram composes with --batch-file: draft-free prompt
    # lookup inside the continuous batcher (one extend verify per round).
    spec_serve = args.draft_model == "ngram" and args.batch_file is not None
    if args.draft_model is not None and not spec_serve:
        # (--demo --draft-model demo: the name is ignored, a small random
        # draft sharing the demo tokenizer is built instead.)
        from zig_gpt2_tpu.runtime.speculative import SpeculativeEngine

        if mesh is not None or args.batch_file is not None:
            sys.exit("error: --draft-model is single-prompt (only 'ngram' "
                     "composes with --batch-file), no --mesh (v1)")
        if args.draft_model == "ngram":
            draft_config = draft_params = None  # prompt lookup
        elif args.demo:
            from zig_gpt2_tpu.config import GPTConfig

            draft_config = GPTConfig(vocab_size=config.vocab_size,
                                     context_size=config.context_size,
                                     n_layers=1, n_heads=2, n_embed=64)
            draft_params = gpt2.init_params(
                draft_config, jax.random.PRNGKey(args.seed + 1), dtype)
        else:
            draft_config = get_config(args.draft_model)
            if args.draft_weights is None:
                sys.exit("error: --draft-weights required with --draft-model"
                         " (or use --demo)")
            from zig_gpt2_tpu.utils import io as zio

            if str(args.draft_weights).endswith(".npz"):
                draft_params = zio.load_pytree_npz(args.draft_weights)
            else:
                draft_params = zio.load_gpt2_raw(args.draft_weights,
                                                 draft_config, dtype=dtype)
        if args.draft_quant and draft_params is not None \
                and "lm_head" not in draft_params:
            from zig_gpt2_tpu.quant import quantize as q

            draft_params = q.quantize_params(draft_params,
                                             mode=args.draft_quant)
        spec = SpeculativeEngine(
            config, params, draft_config, draft_params, k=args.spec_k,
            max_seq=args.max_seq, kv_quant=kv_quant,
            draft_kv_quant="int8" if args.draft_kv_quant else None,
        )
        metrics = GenerationMetrics()
        print(args.prompt, end="", flush=True)
        with xprof_trace(args.profile):
            spec.generate_text(
                args.prompt, encoder, args.max_tokens, sampling,
                stream_to=sys.stdout, metrics=metrics,
                stop_tokens=stop_tokens,
            )
        print()
        if args.metrics:
            print(json.dumps({
                "prompt_tokens": metrics.prompt_tokens,
                "generated_tokens": metrics.generated_tokens,
                "prefill_ms": round(metrics.prefill_ms, 3),
                "ms_per_token": round(metrics.ms_per_token, 3),
                "tokens_per_sec": round(metrics.tokens_per_sec, 2),
            }), file=sys.stderr)
        return

    if args.batch_file is not None:
        from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

        prompts = [
            line for line in Path(args.batch_file).read_text().splitlines() if line
        ]
        spec_kw = {}
        if spec_serve:
            # --decode-chunk N = N speculative rounds per host sync.
            spec_kw = dict(speculative="ngram", spec_k=args.spec_k,
                           spec_chunk=args.decode_chunk or 1)
        batcher = ContinuousBatcher(
            config, params, batch_size=args.batch_slots,
            max_seq=args.max_seq, sampling=sampling, kv_quant=kv_quant,
            decode_chunk=1 if spec_serve else (args.decode_chunk or 1),
            mesh=mesh, **spec_kw,
        )
        if args.prefix:
            batcher.register_prefix(encoder.encode(args.prefix))
        rid_to_prompt = {
            batcher.submit(encoder.encode(p), args.max_tokens, stop_tokens): p
            for p in prompts
        }
        with xprof_trace(args.profile):
            done = batcher.run()
        for req in done:
            print(json.dumps({
                "prompt": rid_to_prompt[req.rid],
                "completion": encoder.decode(req.generated),
            }))
        if args.metrics:
            print(json.dumps(batcher.metrics.as_dict(args.batch_slots)),
                  file=sys.stderr)
        return

    engine = InferenceEngine(
        config, params, encoder, max_seq=args.max_seq, kv_quant=kv_quant,
        mesh=mesh, decode_chunk=args.decode_chunk,
    )
    metrics = GenerationMetrics()

    print(args.prompt, end="", flush=True)
    with xprof_trace(args.profile):
        engine.generate_text(
            args.prompt, args.max_tokens, sampling, stream_to=sys.stdout,
            metrics=metrics, stop_tokens=stop_tokens,
        )
    print()
    if args.metrics:
        print(
            json.dumps(
                {
                    "prompt_tokens": metrics.prompt_tokens,
                    "generated_tokens": metrics.generated_tokens,
                    "prefill_ms": round(metrics.prefill_ms, 3),
                    "ms_per_token": round(metrics.ms_per_token, 3),
                    "ms_per_token_p50": round(metrics.ms_per_token_percentile(50), 3),
                    "ms_per_token_p99": round(metrics.ms_per_token_percentile(99), 3),
                    "tokens_per_sec": round(metrics.tokens_per_sec, 2),
                }
            ),
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()

"""Offline quantized-weight repack tool.

Raw FP32 checkpoint (the reference's format, download_weights.py output)
-> quantized .npz (INT8/INT4 payloads + f32 group scales), loadable by the
CLI / engine via ``--weights <file>.npz``.

    python -m zig_gpt2_tpu.tools.repack \
        --raw models/124M/raw --model 124M --mode int4 \
        --out models/124M/int4.npz

SURVEY.md §5 checkpoint/resume: "quantized weight repacking (INT8/INT4 +
scales) as an offline step" — this is that step. Runs entirely on the host
(no TPU needed).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw", required=True, help="raw checkpoint dir")
    p.add_argument("--model", default="124M")
    p.add_argument("--mode", default="int8", choices=["int8", "int4"])
    p.add_argument("--group-size", type=int, default=None)
    p.add_argument("--tp", type=int, default=1,
                   help="pre-pad head/vocab axes and TP-align the quantized "
                        "layouts for a model-parallel degree (the packed "
                        "int4/scale layouts cannot be padded after "
                        "quantization, so mesh serving of e.g. the 25-head "
                        "1.5B model needs the padding baked in here)")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only tool

    from zig_gpt2_tpu.config import get_config
    from zig_gpt2_tpu.quant import quantize as q
    from zig_gpt2_tpu.utils import io as zio

    config = get_config(args.model)
    params = zio.load_gpt2_raw(args.raw, config, device_put=False)
    params = jax.tree.map(lambda x: jax.numpy.asarray(x), params)
    meta = {"model": args.model, "mode": args.mode}
    if args.tp > 1:
        from zig_gpt2_tpu.parallel import sharding as psh

        params, config = psh.pad_for_tp(params, config, args.tp)
        meta.update(tp=args.tp, padded_heads=config.padded_heads,
                    padded_vocab_size=config.padded_vocab_size)
    qparams = q.quantize_params(
        params, mode=args.mode, group_size=args.group_size, tp=args.tp,
    )
    zio.save_pytree_npz(qparams, args.out, meta=meta)
    import os

    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"{args.mode}, tp={args.tp})")


if __name__ == "__main__":
    main()

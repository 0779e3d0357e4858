"""Dump the TPU-optimized HLO of one decode step and report every
dynamic-slice/dus on a stacked (L-leading) array: which op consumes the
sliced chunk, at what shape, in which memory space.

Motivation (r05): the 1.5B INT4+INT8KV B=1 step profile shows ~691 us/step
of async [48,...]->[12,...] chunk slices (plus a ~125 us/step copy-back) —
11.8% of the graded step — whose consumer is invisible in hlo_stats.
ZG2_DECODE_UNROLL=12 makes the layer indices affine per unrolled body, so
an XLA pass appears to stage 12-layer windows of carried/invariant arrays
through VMEM (S(1)). This tool prints the slice producers/consumers from
the optimized module so the fix can target the right site.

Usage: python tools/dump_hlo.py [--model 1558M] [--quant int4]
       [--kv-quant int8] [--batch 1] [--unroll N] [--out FILE]
"""

import argparse
import re
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="1558M")
    p.add_argument("--quant", default="int4")
    p.add_argument("--kv-quant", default="int8", dest="kv_quant")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--rows", type=int, default=160)
    p.add_argument("--unroll", default=None,
                   help="override ZG2_DECODE_UNROLL for the dump")
    p.add_argument("--out", default=None, help="write full HLO text here")
    args = p.parse_args()

    import os

    if args.unroll is not None:
        os.environ["ZG2_DECODE_UNROLL"] = str(args.unroll)

    import jax
    import jax.numpy as jnp

    from zig_gpt2_tpu.config import get_config
    from zig_gpt2_tpu.models import gpt2

    config = get_config(args.model)
    params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
    if args.quant and args.quant != "none":
        from zig_gpt2_tpu.quant import quantize as q

        params = q.quantize_params(params, mode=args.quant)
    kvq = None if args.kv_quant in (None, "none") else args.kv_quant
    kv_packed = gpt2.default_kv_packed(config, kvq)
    import dataclasses

    config = dataclasses.replace(config, kv_packed=kv_packed)
    cache = gpt2.init_kv_cache(config, args.batch, args.rows, quant=kvq)
    cache["length"] = jnp.full((args.batch,), 64, jnp.int32)
    tokens = jnp.zeros((args.batch,), jnp.int32)

    def step(params, cache, tokens):
        return gpt2.decode_step(params, cache, tokens, config)

    print(f"# lowering decode_step {args.model} quant={args.quant} "
          f"kv={kvq} packed={kv_packed} B={args.batch} "
          f"unroll={os.environ.get('ZG2_DECODE_UNROLL', '12')} "
          f"backend={jax.default_backend()}", flush=True)
    compiled = (jax.jit(step, donate_argnums=(1,))
                .lower(params, cache, tokens).compile())
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()] \
        if hasattr(compiled, "runtime_executable") else [compiled.as_text()]
    hlo = "\n".join(texts)
    if args.out:
        with open(args.out, "w") as f:
            f.write(hlo)
        print(f"# full HLO -> {args.out} ({len(hlo)} bytes)")

    # Index every named op line, then report slices of L-leading arrays.
    lines = hlo.splitlines()
    defs = {}
    for ln in lines:
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", ln)
        if m:
            defs[m.group(1)] = ln.strip()
    L = config.n_layers
    pat = re.compile(rf"\[{L},")
    hits = 0
    for name, ln in defs.items():
        if "slice" not in ln and "dynamic-slice" not in ln:
            continue
        if not pat.search(ln):
            continue
        # producer line
        print("\nPRODUCER:", ln[:400])
        # find consumers: ops whose operand list mentions %name
        uses = [l.strip()[:400] for l in lines
                if re.search(rf"%{re.escape(name)}[,)\s]", l)
                and not l.strip().startswith(("%" + name, "ROOT %" + name))]
        for u in uses[:4]:
            print("  USE:", u)
        hits += 1
        if hits >= 24:
            print("\n... (truncated at 24 slice sites)")
            break
    if not hits:
        print("no L-leading slices found")


if __name__ == "__main__":
    main()

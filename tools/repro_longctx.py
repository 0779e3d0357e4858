"""Minimal TPU repro for the unpacked INT8 multi-chunk decode-attention
fault (2026-08-19: 1.5B INT4+INT8KV B=16 ctx 1152 crashes the TPU worker;
first hardware contact of unpacked quant multi-chunk after the round-4
packed->unpacked default flip).

Calls decode_attention_quant_deferred_fused directly at the failing shape
so the bisect loop is one kernel, not a 5-minute bench run.

Usage: python tools/repro_longctx.py [B] [S] [--stacked] [--appended]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    args = sys.argv[1:]
    b = int(args[0]) if args and not args[0].startswith("-") else 16
    s = int(args[1]) if len(args) > 1 and not args[1].startswith("-") else 1159
    stacked = "--stacked" in args
    appended = "--appended" in args
    h, d, L = 25, 64, 3

    from zig_gpt2_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    kn = jnp.asarray(rng.integers(-127, 127, (b, h, d)), jnp.int8)
    vn = jnp.asarray(rng.integers(-127, 127, (b, h, d)), jnp.int8)
    ksn = jnp.asarray(rng.random((b, h)), jnp.float32)
    vsn = jnp.asarray(rng.random((b, h)), jnp.float32)
    cshape = (L, b, h, s, d) if stacked else (b, h, s, d)
    pshape = cshape[:-1]
    kc = jnp.asarray(rng.integers(-127, 127, cshape), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 127, cshape), jnp.int8)
    ks = jnp.asarray(rng.random(pshape), jnp.float32)
    vs = jnp.asarray(rng.random(pshape), jnp.float32)
    length = jnp.full((b,), s - 8, jnp.int32)
    layer = jnp.asarray(1, jnp.int32) if stacked else None

    print(f"repro: B={b} S={s} stacked={stacked} appended={appended} "
          f"backend={jax.default_backend()}", flush=True)
    if appended:
        out = A.decode_attention_quant_fused(
            q, kc, ks, vc, vs, length, layer=layer)
    else:
        out = A.decode_attention_quant_deferred_fused(
            q, kn, ksn, vn, vsn, kc, ks, vc, vs, length, layer=layer)
    print("compiled+dispatched; syncing...", flush=True)
    res = np.asarray(out)
    print("OK:", res.shape, float(np.abs(res).max()), flush=True)


if __name__ == "__main__":
    main()

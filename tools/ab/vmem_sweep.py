"""Scoped-VMEM boundary sweep for the PACKED quant decode-attention kernel.

ab_packed (round 4) hit a compile-time scoped-VMEM OOM (24.14M > 16M) at
single-chunk sc=1152 / hp=13 / B=16 — a shape the picker considers in
budget (blocks ~8 MB) but whose statically-unrolled inner loop keeps too
many f32 temporaries live. This sweep compile-checks (no execution, no
real HBM) the exact failing kernel at a grid of S values to find the real
boundary, which then sets the single-chunk cap in _pick_block.

Usage: python tools/ab/vmem_sweep.py [hp] [B]   (defaults 13 16)
Run serially — compiles go through the one TPU-owning process.

Round 5: scale shapes are PER-PAIR ((B, Hp) rows, (L, B, Hp, S) planes) and
the sweep raises ZG2_PACKED_VMEM_FENCE so _pick_block actually attempts
single-chunk at every S — the printed OK/OOM boundary re-pins the fence.
"""
import os

os.environ.setdefault("ZG2_PACKED_VMEM_FENCE", str(1 << 30))
import functools
import sys

import jax
import jax.numpy as jnp

from zig_gpt2_tpu.ops import attention as A

HP = int(sys.argv[1]) if len(sys.argv) > 1 else 13
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
L, D2 = 48, 128

sds = jax.ShapeDtypeStruct
for s in (384, 512, 640, 768, 896, 1024, 1152, 1280, 1536, 2048):
    bc, sc, n_chunks = A._pick_block(B, HP, s, 1, quant=True, foldable=True,
                                     packed=True)
    args = (
        sds((B, HP, D2), jnp.bfloat16),            # q
        sds((B, HP, D2), jnp.int8),                # k_new
        sds((B, HP), jnp.float32),                 # ks_new (per-pair)
        sds((B, HP, D2), jnp.int8),                # v_new
        sds((B, HP), jnp.float32),                 # vs_new
        sds((L, B, HP, s, D2), jnp.int8),          # k_cache
        sds((L, B, HP, s), jnp.float32),           # k_scale (per-pair)
        sds((L, B, HP, s, D2), jnp.int8),          # v_cache
        sds((L, B, HP, s), jnp.float32),           # v_scale
        sds((B,), jnp.int32),                      # length
        sds((), jnp.int32),                        # layer
    )

    def f(q, kn, ksn, vn, vsn, kc, ks, vc, vs, ln, layer):
        return A.decode_attention_quant_deferred_fused(
            q, kn, ksn, vn, vsn, kc, ks, vc, vs, ln,
            layer=layer, packed=True)

    try:
        jax.jit(f).lower(*args).compile()
        verdict = "OK"
    except Exception as e:  # noqa: BLE001 — the OOM class varies
        msg = str(e)
        verdict = ("VMEM-OOM " + msg[msg.find("Scoped allocation"):][:60]
                   if "vmem" in msg.lower() else f"FAIL {msg[:120]}")
    print(f"S={s:5d} -> bc={bc} sc={sc:5d} chunks={n_chunks}: {verdict}",
          flush=True)
print("alldone")

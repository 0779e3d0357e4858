"""GPT-2 as pure functions over parameter pytrees.

A TPU-first re-design of the reference's model layer (main.zig:5-208):

- Parameters are a plain dict pytree; all per-block leaves carry a leading
  ``n_layers`` axis so the transformer stack is a single ``lax.scan`` — one
  traced block instead of n_layers unrolled copies (compile time and HBM
  locality; the reference instead loops over 12 Block structs,
  main.zig:186-188).
- The KV cache is a fixed-shape pytree ``{"k","v": (L, B, H, max_seq, D),
  "length": (B,) int32}`` updated with dynamic slices — replacing the
  reference's per-block Zig arrays + per-step full-cache transpose
  (ops.zig:151-158, the ★★ inefficiency in SURVEY.md §3.3).
- ``prefill`` consumes the whole prompt in one batched pass (the reference
  feeds prompt tokens one at a time, main.zig:331-334, an artifact of its
  batch=1 ops) and skips the lm_head except at the last position — the same
  compute_logits=false optimization as main.zig:192-194.
- ``decode_step`` is the zero-allocation steady state: jit with the cache
  donated, so HBM buffers are updated in place (the TPU analogue of the
  reference's preallocated State arena, main.zig:26-65).
- Weight tying: lm_head = wte (main.zig:312).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.ops import layers as ops


def _use_fused_attention(config: GPTConfig) -> bool:
    """Fused Pallas decode attention on TPU (ZG2_FUSED_ATTN=0 to disable,
    =interpret to force the kernel in interpret mode on CPU — packed-layout
    model tests). Disabled under an SPMD mesh (config.spmd) — GSPMD cannot
    partition the custom call; see _use_sharded_kernels for the shard_map
    path that keeps the kernels per-shard."""
    if config.spmd:
        return False
    opt = os.environ.get("ZG2_FUSED_ATTN", "1")
    if opt == "0":
        return False
    if opt == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _fused_interpret() -> bool:
    return os.environ.get("ZG2_FUSED_ATTN") == "interpret"


def default_kv_packed(config: GPTConfig, kv_quant=None) -> bool:
    """Whether the runtime should serve with the head-pair-packed KV cache
    (config.kv_packed): when the fused kernels are active and head_dim is
    the GPT-2 64 (two heads fill one 128-lane register row). The layout
    halves the decode-attention kernel's VPU work
    (ops/attention._build_kernel_packed). Hardware A/Bs: bf16 cache +12%
    (124M B=1, 1035.7 -> 1162.7 tok/s, r04 ab_wmm grid). The INT8 cache
    lost under per-HEAD scales (0.945x, r04 ab_packed — half-axis scale
    planes) but WINS under the per-PAIR scales that are now the packed
    quant layout (+7.4%, 1149.8 -> 1234.8 tok/s, 1.5B INT4+INT8KV B=16,
    r05 ab_packed_pair; ctx-1152 multi-chunk 336.7 tok/s vs r04's
    unpacked 243.5) — so packed is default for BOTH cache dtypes since
    r05. Single-chunk scoped-VMEM still caps at sc=768 per vmem_sweep_pair
    (_pick_block fences force multi-chunk above). ZG2_KV_PACKED=0 forces
    off, =1 forces on wherever legal (A/B).

    Under a mesh the layout works iff decode runs the step-level manual
    path (parallel/step_spmd — the per-shard body then dispatches the
    same packed kernels) AND the per-shard head count is even: pairs are
    formed inside a shard, never across the model-axis boundary. (The
    op-level shard_kernels specs are unpacked-only.)"""
    opt = os.environ.get("ZG2_KV_PACKED", "auto")
    if opt == "0":
        return False
    if config.head_dim != 64:
        return False
    if config.spmd:
        from zig_gpt2_tpu.parallel import step_spmd
        from zig_gpt2_tpu.parallel.mesh import MODEL_AXIS

        if not step_spmd.enabled(config):
            return False
        tp = config.mesh.shape[MODEL_AXIS]
        if (config.attn_heads // tp) % 2:
            return False
        return _use_fused_attention(step_spmd.local_config(config))
    return _use_fused_attention(config)


def fuse_qkv_params(params: Params) -> Params:
    """Concatenate the three attention projections into ONE stacked
    ``wqkv`` leaf (N axis: [Q | K | V]) so each decode/prefill layer runs
    one (E, 3A) weight stream instead of three (E, A) dispatches — the
    reference's packed c_attn GEMM (ops.zig:143), recovered for the
    SINGLE-DEVICE runtime only (under TP the Q/K/V boundaries at A, 2A
    don't align with shard boundaries — see init_params). Applied by
    parallel.mesh.prepare_serving under ZG2_FUSE_QKV; a runtime-local
    transform, never written back to checkpoints.

    Works on float ("w") and quantized ("qw"/"qw4" + "scale") layers: the
    INT4 half-split nibble packing and the scale groups live on the K
    axis, so an N-axis concat preserves both."""
    blocks = dict(params["blocks"])
    attn = dict(blocks["attn"])
    if "wqkv" in attn:
        return params
    parts = [attn.pop(n) for n in ("wq", "wk", "wv")]
    fused = {
        key: jnp.concatenate([p[key] for p in parts], axis=-1)
        for key in parts[0]
        if key in ("w", "qw", "qw4", "scale", "b")
    }
    attn["wqkv"] = fused
    blocks["attn"] = attn
    return dict(params, blocks=blocks)


def _fuse_qkv_enabled() -> bool:
    """ZG2_FUSE_QKV=1 enables the fused QKV projection (A/B candidate for
    the B=1 headline step — default off until the hardware A/B)."""
    return os.environ.get("ZG2_FUSE_QKV", "0") == "1"


def _packed_heads(config: GPTConfig) -> tuple[int, int]:
    """(padded head count, packed row count) for the packed cache layout.
    An odd head count (1.5B's 25) gets one zero phantom head — padded per
    step on the q/k/v rows, never materialized in the weights."""
    hpad = config.attn_heads + (config.attn_heads % 2)
    return hpad, hpad // 2


def _use_sharded_kernels(config: GPTConfig) -> bool:
    """Per-shard Pallas kernels via op-level shard_map when serving over a
    mesh (config.mesh set by parallel.mesh.prepare_params). On by default
    on TPU; ZG2_SPMD_KERNELS=0 disables, ZG2_SPMD_KERNELS=interpret forces
    the path in kernel interpret mode on CPU (mesh parity tests)."""
    if not (config.spmd and config.mesh is not None):
        return False
    opt = os.environ.get("ZG2_SPMD_KERNELS", "auto")
    if opt == "0":
        return False
    if opt == "interpret":
        return True
    return jax.default_backend() == "tpu" and os.environ.get(
        "ZG2_FUSED_ATTN", "1"
    ) != "0"


def _spmd_interpret() -> bool:
    return os.environ.get("ZG2_SPMD_KERNELS") == "interpret"


def _use_wmm(config: GPTConfig) -> bool:
    """Float-weight decode GEMVs through the stacked Pallas kernel
    (quant/kernels.wmm). Default OFF since the round-4 hardware A/B
    (ab_wmm grid, 124M bf16 B=1 back-to-back): with the packed KV cache
    on, wmm measured 1124.5 vs 1162.7 tok/s without it — XLA's own bf16
    GEMV fusions win once attention stops dominating the step. ZG2_WMM=1
    re-enables (it still wins when packed is ALSO off: 1089.5 vs 1035.7),
    =interpret forces on CPU."""
    if config.spmd:
        return False
    opt = os.environ.get("ZG2_WMM", "0")
    if opt == "0":
        return False
    if opt == "interpret":
        return True
    return jax.default_backend() == "tpu"


def _wmm_interpret() -> bool:
    return os.environ.get("ZG2_WMM") == "interpret"


def _decode_attention(q, caches, idx, length, config, start=None):
    """Decode attention over the stacked (L, B, H, S, D) cache at layer idx.
    ``q`` and the result are in the cache's layout (packed when
    config.kv_packed). ``start``: ring-interval starts (config.ring_cache)."""
    from zig_gpt2_tpu.ops import attention as fused

    if _use_fused_attention(config):
        return fused.decode_attention_fused(
            q, caches["k"], caches["v"], length, layer=idx,
            packed=config.kv_packed, interpret=_fused_interpret(),
            start=start,
        )
    k = jax.lax.dynamic_index_in_dim(caches["k"], idx, 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(caches["v"], idx, 0, keepdims=False)
    if config.kv_packed:  # jnp fallback: unpack views (correct, not hot)
        out = ops.decode_attention(
            fused.unpack_heads_rows(q), fused.unpack_heads_seq(k),
            fused.unpack_heads_seq(v), length, start=start)
        return fused.pack_heads_rows(out)
    return ops.decode_attention(q, k, v, length, start=start)


def _decode_attention_quant(q, caches, idx, length, config, start=None):
    from zig_gpt2_tpu.ops import attention as fused

    if _use_fused_attention(config):
        return fused.decode_attention_quant_fused(
            q, caches["k"], caches["k_scale"], caches["v"], caches["v_scale"],
            length, layer=idx, packed=config.kv_packed,
            interpret=_fused_interpret(), start=start,
        )
    sl = {
        name: jax.lax.dynamic_index_in_dim(caches[name], idx, 0, keepdims=False)
        for name in ("k", "k_scale", "v", "v_scale")
    }
    if config.kv_packed:
        out = ops.decode_attention_quant(
            fused.unpack_heads_rows(q),
            fused.unpack_heads_seq(sl["k"]),
            fused.unpack_pair_scales_seq(sl["k_scale"]),
            fused.unpack_heads_seq(sl["v"]),
            fused.unpack_pair_scales_seq(sl["v_scale"]), length, start=start)
        return fused.pack_heads_rows(out)
    return ops.decode_attention_quant(
        q, sl["k"], sl["k_scale"], sl["v"], sl["v_scale"], length,
        start=start,
    )

Params = Dict[str, Any]
KVCache = Dict[str, jax.Array]


def _embed_tokens(wte: jax.Array, tokens: jax.Array, config: GPTConfig) -> jax.Array:
    """Token-embedding gather. Inside the step-level shard_map body
    (config.manual_axis set — parallel/step_spmd) ``wte`` is this shard's
    contiguous vocab-row slice; global token ids are resolved by a masked
    local lookup + one psum over the model axis (the Megatron vocab-parallel
    embedding; O(B·E) wire — noise next to the weight stream)."""
    if config.manual_axis is None:
        return ops.embedding(tokens, wte)
    ax = config.manual_axis
    vl = wte.shape[0]
    local = tokens - jax.lax.axis_index(ax) * vl
    ok = (local >= 0) & (local < vl)
    x = ops.embedding(jnp.clip(local, 0, vl - 1), wte)
    x = jnp.where(ok[..., None], x, jnp.zeros((), x.dtype))
    return jax.lax.psum(x, ax)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def init_params(
    config: GPTConfig, key: jax.Array, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Random GPT-2 initialization (N(0, 0.02), residual-proj scaled)."""
    E, L = config.n_embed, config.n_layers
    A = config.attn_heads * config.head_dim  # attention width (== E unpadded)
    keys = iter(jax.random.split(key, 16))

    def normal(k, shape, std=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    # Residual projections scaled by 1/sqrt(2*n_layers) (GPT-2 init).
    proj_std = 0.02 / (2.0 * L) ** 0.5
    params: Params = {
        "wte": normal(next(keys), (config.vocab_rows, E)),
        "wpe": normal(next(keys), (config.context_size, E), std=0.01),
        "blocks": {
            "ln_1": {"w": jnp.ones((L, E), dtype), "b": jnp.zeros((L, E), dtype)},
            # Q/K/V are separate projections (the reference packs them into
            # one c_attn GEMM, ops.zig:143; unpacked here because the packed
            # 3A axis cannot be head-sharded with a single PartitionSpec —
            # Q/K/V boundaries at A, 2A don't align with shard boundaries at
            # multiples of 3A/tp. The raw-checkpoint importer splits the
            # reference's packed layout; the exporter repacks it.)
            "attn": {
                "wq": {
                    "w": normal(next(keys), (L, E, A)),
                    "b": jnp.zeros((L, A), dtype),
                },
                "wk": {
                    "w": normal(next(keys), (L, E, A)),
                    "b": jnp.zeros((L, A), dtype),
                },
                "wv": {
                    "w": normal(next(keys), (L, E, A)),
                    "b": jnp.zeros((L, A), dtype),
                },
                "c_proj": {
                    "w": normal(next(keys), (L, A, E), std=proj_std),
                    "b": jnp.zeros((L, E), dtype),
                },
            },
            "ln_2": {"w": jnp.ones((L, E), dtype), "b": jnp.zeros((L, E), dtype)},
            "mlp": {
                "c_fc": {
                    "w": normal(next(keys), (L, E, 4 * E)),
                    "b": jnp.zeros((L, 4 * E), dtype),
                },
                "c_proj": {
                    "w": normal(next(keys), (L, 4 * E, E), std=proj_std),
                    "b": jnp.zeros((L, E), dtype),
                },
            },
        },
        "ln_f": {"w": jnp.ones((E,), dtype), "b": jnp.zeros((E,), dtype)},
    }
    return params


def init_kv_cache(
    config: GPTConfig,
    batch_size: int = 1,
    max_seq: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
    quant: Optional[str] = None,
    ring: Optional[bool] = None,
) -> KVCache:
    """Preallocate the full fixed-shape KV cache (reference: main.zig:298-299
    allocates context_size×n_embed per block up front).

    quant="int8" stores K/V rows as int8 with per-(token, head) f32 scales
    (quantize-on-append; dequant folded into the attention math — see
    ops.layers.decode_attention_quant). Memory: D bytes/row + 4 scale bytes
    vs 2·D bf16 — ~2x more sequences per HBM.
    """
    max_seq = max_seq or config.context_size
    if config.kv_packed:
        # Head-pair-packed layout (see config.kv_packed / ops.attention):
        # two heads per 128-lane row; INT8 scales are per-PAIR (one per
        # packed row per token) so the planes are (L, B, Hp, S) — half the
        # scale bytes of the unpacked layout.
        _, hp = _packed_heads(config)
        shape = (config.n_layers, batch_size, hp, max_seq, 2 * config.head_dim)
        plane = (config.n_layers, batch_size, hp, max_seq)
    else:
        shape = (config.n_layers, batch_size, config.attn_heads, max_seq,
                 config.head_dim)
        plane = shape[:-1]
    if quant == "int8":
        cache = {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(plane, jnp.float32),
            "v_scale": jnp.zeros(plane, jnp.float32),
            "length": jnp.zeros((batch_size,), jnp.int32),
        }
    elif quant is not None:
        raise ValueError(f"unknown KV quantization {quant!r}")
    else:
        cache = {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
            "length": jnp.zeros((batch_size,), jnp.int32),
        }
    if config.ring_cache if ring is None else ring:
        # Ring mode (see GPTConfig.ring_cache): per-lane interval starts +
        # the shared scalar write pointer, both device-resident cache state.
        # ``ring=False`` overrides for LINEAR lane caches built under a
        # ring config (the batcher's admission slot caches — admissions
        # rotate them into ring position on splice).
        cache["start"] = jnp.zeros((batch_size,), jnp.int32)
        cache["wptr"] = jnp.zeros((), jnp.int32)
    return cache


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _linear(
    p: Dict[str, jax.Array], x: jax.Array, spmd: bool = False,
    act_quant: bool = False,
) -> jax.Array:
    """Apply a linear layer's param dict; dispatches to the fused
    dequant+matmul path when the weight is quantized."""
    if "qw" in p or "qw4" in p:
        from zig_gpt2_tpu.quant import quantize as q

        return q.quantized_linear(p, x, spmd=spmd, act_quant=act_quant)
    return ops.linear(x, p["w"], p.get("b"))


def _qkv(
    attn_p: Params, h: jax.Array, n_heads: int, config: GPTConfig = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project to per-head Q/K/V: (..., E) -> three (..., H, D).

    (Replaces the reference's packed c_attn GEMM + split_qkv copy,
    ops.zig:143-147/179-199 — the head split here is a free reshape because
    each projection is already head-major.)
    """
    spmd = config.spmd if config is not None else False
    aq = config.act_quant if config is not None else False

    def heads(t):
        return t.reshape(*t.shape[:-1], n_heads, t.shape[-1] // n_heads)

    if "wqkv" in attn_p:  # fused projection (fuse_qkv_params)
        qkv = _linear(attn_p["wqkv"], h, spmd, aq)
        return tuple(heads(t) for t in jnp.split(qkv, 3, axis=-1))
    return (
        heads(_linear(attn_p["wq"], h, spmd, aq)),
        heads(_linear(attn_p["wk"], h, spmd, aq)),
        heads(_linear(attn_p["wv"], h, spmd, aq)),
    )


def _seq_shard(x: jax.Array, config: GPTConfig) -> jax.Array:
    """Prefill sequence parallelism: constrain a (B, T, E) activation to
    (data, model, None) so the elementwise stretch between matmuls runs
    sequence-sharded (config.seq_parallel; see GPTConfig)."""
    if not (config.seq_parallel and config.spmd and config.mesh is not None):
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zig_gpt2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(config.mesh, P(DATA_AXIS, MODEL_AXIS, None))
    )


def _block_prefill(
    x: jax.Array,
    bp: Params,
    config: GPTConfig,
    length_mask: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One transformer block over a full sequence. Returns (x, k, v) with
    k/v shaped (B, H, T, D) for cache insertion.

    Reference block semantics: main.zig:119-146 (ln_1 → attn → residual →
    ln_2 → mlp → residual).
    """
    B, T, _ = x.shape
    x = _seq_shard(x, config)
    h = ops.layer_norm(x, bp["ln_1"]["w"], bp["ln_1"]["b"], config.layer_norm_eps)
    q, k, v = _qkv(bp["attn"], h, config.attn_heads, config)  # (B, T, H, D)
    q, k, v = (t.swapaxes(1, 2) for t in (q, k, v))  # (B, H, T, D)
    attn = ops.causal_attention(q, k, v, length_mask=length_mask)
    attn = attn.swapaxes(1, 2).reshape(B, T, -1)
    x = x + _linear(bp["attn"]["c_proj"], attn, config.spmd, config.act_quant)
    h = ops.layer_norm(x, bp["ln_2"]["w"], bp["ln_2"]["b"], config.layer_norm_eps)
    h = _linear(bp["mlp"]["c_fc"], h, config.spmd, config.act_quant)
    h = ops.gelu(h)
    x = x + _linear(bp["mlp"]["c_proj"], h, config.spmd, config.act_quant)
    return x, k, v


def _put_row_stacked(
    stack: jax.Array, row: jax.Array, idx: jax.Array, pos: jax.Array
) -> jax.Array:
    """Write (B, H, D) rows into the stacked (L, B, H, S, D) cache at
    (idx, b, :, pos[b], :) — row-granular in-place updates of the scan
    carry, one dynamic_update_slice per batch element (B is static).

    NOT a vmap: batching dynamic_update_slice over a non-leading operand
    axis lowers to a scatter/transpose of the whole cache — measured 44x
    slower at B=16 on the 1.5B model.

    A SCALAR ``pos`` is the caller's PROOF that every lane shares the
    position (the only site that produces one is _block_decode's wpos,
    gated on config.uniform_pos / config.ring_cache): one dus spanning
    the batch axis replaces the B-unrolled loop (the unroll is 3072
    serial dus/step at 1.5B B=16, 15.4% of the step — hlo_stats, r04)."""
    if getattr(pos, "ndim", 1) == 0:
        return jax.lax.dynamic_update_slice(
            stack,
            row[None, :, :, None, :].astype(stack.dtype),
            (idx, 0, 0, pos, 0),
        )
    b = row.shape[0]
    for i in range(b):
        stack = jax.lax.dynamic_update_slice(
            stack,
            row[i][None, None, :, None, :].astype(stack.dtype),
            (idx, i, 0, pos[i], 0),
        )
    return stack


def _put_scale_stacked(
    stack: jax.Array, s: jax.Array, idx: jax.Array, pos: jax.Array
) -> jax.Array:
    """Write (B, H) scales into the stacked (L, B, H, S) plane at
    (idx, b, …, pos[b]) — or (B, 2, Hp) rows into the packed (L, B, 2, Hp, S)
    plane. Same per-batch unroll — and same scalar-``pos`` single-dus fast
    path — as _put_row_stacked."""
    if getattr(pos, "ndim", 1) == 0:
        return jax.lax.dynamic_update_slice(
            stack,
            s[None, ..., None].astype(stack.dtype),
            (idx, 0) + (0,) * (s.ndim - 1) + (pos,),
        )
    b = s.shape[0]
    for i in range(b):
        row = s[i][None, None, ..., None]  # (1, 1, *s.shape[1:], 1)
        stack = jax.lax.dynamic_update_slice(
            stack,
            row.astype(stack.dtype),
            (idx, i) + (0,) * (s.ndim - 1) + (pos[i],),
        )
    return stack


def _layer_slice(tree: Params, idx: jax.Array) -> Params:
    """Slice every (L, ...) leaf of a stacked param subtree at layer idx."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False), tree
    )


def _gemv_dispatch(
    p: Dict[str, jax.Array],
    x2: jax.Array,
    idx: jax.Array,
    config: GPTConfig,
    allow_qmm: bool = True,
) -> jax.Array:
    """THE decode-GEMV dispatch policy, in one place (advisor r03 #4):
    (rows, K) activations @ stacked layer ``idx`` -> (rows, N) float32,
    NO bias and NO collective — callers add the bias after their psum.

    Selection: fused stacked qmm when the quantized Pallas kernel may run
    (TPU backend, GEMV-shaped rows <= kernels.GEMV_MAX_ROWS — 64 for the
    w8a8 variant — ZG2_QMM!=0, ``allow_qmm`` — False under GSPMD tracing
    where the custom call can't partition); stacked wmm for float weights
    (_use_wmm); else the jnp fallbacks (w8a8 when per-channel INT8 +
    act_quant, grouped dequant matmul otherwise, plain dot for float).
    Shared by the single-device path (_linear_at) and the step-level
    manual body (_row_linear_manual) so gate fixes land once."""
    rows = x2.shape[0]
    if "qw" in p or "qw4" in p:
        from zig_gpt2_tpu.quant import kernels

        int4 = "qw4" in p
        qw = p["qw4"] if int4 else p["qw"]
        cap = (kernels.W8A8_MAX_ROWS if (config.act_quant and not int4)
               else kernels.GEMV_MAX_ROWS)
        if (allow_qmm and jax.default_backend() == "tpu" and rows <= cap
                and os.environ.get("ZG2_QMM", "1") != "0"):
            return kernels.qmm(x2, qw, p["scale"], int4=int4, layer=idx,
                               w8a8=config.act_quant)
        from zig_gpt2_tpu.quant import quantize as q

        pl = _layer_slice({"q": qw, "scale": p["scale"]}, idx)
        qfull = q.unpack_int4(pl["q"]) if int4 else pl["q"]
        if config.act_quant and not int4 and pl["scale"].shape[-2] == 1:
            return q.w8a8_matmul(x2, qfull, pl["scale"])
        return q._grouped_matmul_jnp(x2, qfull, pl["scale"])
    if _use_wmm(config):
        from zig_gpt2_tpu.quant import kernels

        if rows <= kernels.GEMV_MAX_ROWS:
            return kernels.wmm(x2, p["w"], layer=idx,
                               interpret=_wmm_interpret())
    w = jax.lax.dynamic_index_in_dim(p["w"], idx, 0, keepdims=False)
    return jnp.dot(x2, w, preferred_element_type=jnp.float32)


def _qmm_cap(config: GPTConfig, int4: bool) -> int:
    """Row cap for the fused quantized GEMV kernels (see
    quant.kernels.GEMV_MAX_ROWS): 256, except 64 for the w8a8 variant."""
    from zig_gpt2_tpu.quant import kernels

    return (kernels.W8A8_MAX_ROWS if (config.act_quant and not int4)
            else kernels.GEMV_MAX_ROWS)


def _row_linear_manual(
    p: Dict[str, jax.Array], x: jax.Array, idx: jax.Array, config: GPTConfig
) -> jax.Array:
    """Row-parallel stacked linear inside the step-level shard_map body
    (config.manual_axis — parallel/step_spmd): the weight leaves are this
    shard's contiguous K-slice, ``x`` is the matching feature shard (the
    preceding column-parallel output feeds it directly, the standard
    Megatron pairing — no communication on entry), and ONE psum over the
    manual axis completes the contraction. The bias is replicated and must
    be added AFTER the psum (inside, it would be summed tp times).

    INT4 is the exception on entry: the half-split nibble packing pairs
    feature k with k + K/2, so this shard's packed rows span two disjoint
    feature ranges — x is all-gathered back to full K and the two ranges
    sliced out (shard_kernels.int4_row_shard_slices; the (B, K) gather is
    noise next to the weight stream it unblocks). Grouped INT4 scales ride
    replicated for the same reason (see parallel/step_spmd.step_pspecs).
    """
    ax = config.manual_axis
    lead, k_local = x.shape[:-1], x.shape[-1]
    rows = x.size // k_local
    x2 = x.reshape(rows, k_local)
    p2 = p
    if "qw4" in p:
        xg = jax.lax.all_gather(x2, ax, axis=1, tiled=True)  # (rows, K)
        tp = xg.shape[1] // k_local
        from zig_gpt2_tpu.parallel.shard_kernels import int4_row_shard_slices

        x2, scale = int4_row_shard_slices(xg, p["scale"], tp, ax)
        p2 = {"qw4": p["qw4"], "scale": scale}
    if "qw" in p or "qw4" in p:
        n = (p["qw4"] if "qw4" in p else p["qw"]).shape[-1]
    else:
        n = p["w"].shape[-1]
    y = _gemv_dispatch(p2, x2, idx, config)
    y = jax.lax.psum(y, ax)
    y = y.astype(x.dtype).reshape(*lead, n)
    if "b" in p:
        y = y + jax.lax.dynamic_index_in_dim(p["b"], idx, 0, keepdims=False)
    return y


def _linear_at(
    p: Dict[str, jax.Array],
    x: jax.Array,
    idx: jax.Array,
    config: GPTConfig,
    role: str = "col",
) -> jax.Array:
    """Apply layer ``idx`` of a stacked linear. On TPU the quantized GEMV
    path feeds the Pallas kernel the WHOLE stacked weight with the layer
    selected in the kernel's index map — XLA never materializes a per-layer
    slice (profiled at ~135 GB/s + an extra copy when it has to).

    ``role`` ("col" | "row") is the layer's Megatron parallelism class,
    used only by the shard_map path: column-parallel layers shard N (no
    collective), row-parallel layers shard K (one psum)."""
    if config.manual_axis is not None and role == "row":
        return _row_linear_manual(p, x, idx, config)
    quantized = "qw" in p or "qw4" in p
    rows = x.size // x.shape[-1]
    int4 = "qw4" in p
    if (quantized and rows <= _qmm_cap(config, int4)
            and _use_sharded_kernels(config)):
        qw = p["qw4"] if int4 else p["qw"]
        from zig_gpt2_tpu.parallel import shard_kernels as sk

        x2 = x.reshape(rows, x.shape[-1])
        y = sk.qmm_sharded(
            x2, qw, p["scale"], int4=int4, role=role, mesh=config.mesh,
            layer=idx, interpret=_spmd_interpret(),
            w8a8=config.act_quant,
        )
        y = y.astype(x.dtype).reshape(*x.shape[:-1], qw.shape[-1])
        if "b" in p:
            y = y + jax.lax.dynamic_index_in_dim(p["b"], idx, 0, keepdims=False)
        return y
    # GEMV-shaped cases go through the ONE dispatch core (stacked qmm /
    # stacked wmm / jnp fallbacks; ZG2_QMM=0 and ZG2_WMM=0 are honored
    # there — previously ZG2_QMM=0 fell through to quantized_linear, which
    # re-entered the per-layer Pallas qmm, breaking the escape hatch).
    # Excluded under GSPMD tracing: the custom call can't be partitioned
    # (the op-level shard_map branch above is the mesh alternative).
    if (rows <= _qmm_cap(config, int4) and not config.spmd
            and (quantized or _use_wmm(config))):
        x2 = x.reshape(rows, x.shape[-1])
        y = _gemv_dispatch(p, x2, idx, config)
        n = (p["qw4"] if "qw4" in p else p["qw"] if "qw" in p else p["w"]).shape[-1]
        y = y.astype(x.dtype).reshape(*x.shape[:-1], n)
        if "b" in p:
            y = y + jax.lax.dynamic_index_in_dim(p["b"], idx, 0, keepdims=False)
        return y
    return _linear(_layer_slice(p, idx), x, config.spmd, config.act_quant)


def _block_decode(
    x: jax.Array,
    blocks: Params,
    idx: jax.Array,
    caches: Dict[str, jax.Array],
    pos: jax.Array,
    config: GPTConfig,
    ring_state: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One transformer block for a single decode token, operating directly
    on the scan-STACKED caches (the cache lives in the scan carry so jit
    donation aliases it in place — routing it through scan xs/ys forced a
    full cache copy per step, 14% of the 1.5B decode profile).

    Args:
      x: (B, E) current hidden state.
      blocks: the stacked per-layer params (closure-invariant in the scan).
      idx: scalar int32 layer index.
      caches: {"k","v": (L, B, H, max_seq, D)} plus
        {"k_scale","v_scale": (L, B, H, max_seq)} when the cache is INT8.
      pos: (B,) int32 — valid row count per lane (== token position).
      ring_state: (start (B,), wptr scalar) under config.ring_cache — the
        append lands at ring row ``wptr`` for EVERY lane (one
        batch-spanning dus per array) and attention masks the interval
        [start, start+pos) mod S instead of the prefix [0, pos).

    Returns (x, caches) with the new K/V row written at (idx, :, :, pos)
    (ring: (idx, :, :, wptr)).
    """
    ln1 = _layer_slice(blocks["ln_1"], idx)
    h = ops.layer_norm(x, ln1["w"], ln1["b"], config.layer_norm_eps)
    H = config.attn_heads

    def heads(t):
        return t.reshape(*t.shape[:-1], H, t.shape[-1] // H)

    if "wqkv" in blocks["attn"]:  # fused projection (fuse_qkv_params)
        qkv = _linear_at(blocks["attn"]["wqkv"], h, idx, config)
        q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = heads(_linear_at(blocks["attn"]["wq"], h, idx, config))  # (B,H,D)
        k = heads(_linear_at(blocks["attn"]["wk"], h, idx, config))
        v = heads(_linear_at(blocks["attn"]["wv"], h, idx, config))

    # Append this token's K/V at row `pos` (per batch element). Replaces the
    # reference's append + full-cache transpose (ops.zig:151-158) with an
    # in-place O(row) dynamic update. (A Pallas aliased-DMA appender was
    # prototyped to stop XLA relayout-copying the cache around the custom
    # calls, but Mosaic DMA windows must tile-align in BOTH minor dims and
    # head_dim=64 < 128 lanes can never satisfy that — see BENCHMARKS.md
    # "open issue".)
    caches = dict(caches)
    # Cache-write position: collapse to ONE shared scalar when the caller
    # proved every lane sits at the same position (config.uniform_pos) —
    # the appends then cost one dus per array instead of B (see
    # _put_row_stacked). Ring mode generalizes this to position-DIVERGENT
    # lanes: the write row is the shared ring pointer, always scalar.
    # Attention kernels still take the vector `pos` (+ ring starts).
    if ring_state is not None:
        ring_start, wpos = ring_state
    else:
        ring_start = None
        wpos = pos[0] if (config.uniform_pos and getattr(pos, "ndim", 0)) else pos
    sharded = _use_sharded_kernels(config)
    assert ring_state is None or not sharded, \
        "ring cache is not supported on the op-level shard_map path"
    deferred = _use_fused_attention(config) or sharded
    packed = config.kv_packed
    if packed:
        # Head-pair-packed cache: pad a zero phantom head when H is odd
        # (inert: zero q -> uniform attention over zero v -> zero output,
        # sliced off below), then fold adjacent heads into 128-lane rows.
        # The row pack is a FREE reshape; scale rows become (B, 2, Hp).
        from zig_gpt2_tpu.ops import attention as fused_mod

        assert not sharded, "packed KV layout is single-device-only"
        hpad, _hp = _packed_heads(config)
        if hpad != H:
            zpad = ((0, 0), (0, hpad - H), (0, 0))
            q = jnp.pad(q, zpad)
            k = jnp.pad(k, zpad)
            v = jnp.pad(v, zpad)
        q = fused_mod.pack_heads_rows(q)
    if "k_scale" in caches:  # INT8 cache: quantize on append
        if packed:
            # Pack FIRST, then quantize per packed row: one scale per head
            # PAIR per token — the packed-layout quantization semantics
            # (scale planes (…, Hp, S); both heads of a pair share the
            # scale, gated by the PPL budget like every quant mode).
            k, v = fused_mod.pack_heads_rows(k), fused_mod.pack_heads_rows(v)
        kq, ks = ops.quantize_kv(k)
        vq, vs = ops.quantize_kv(v)
        if deferred:
            # Attend over the OLD cache + an explicit self-term for this
            # token (mathematically identical; the kernel never reads the
            # appended row, so the appends below have no reader in this
            # step and stay true in-place updates — appending first forced
            # XLA into copy-on-write of the cache around the custom call).
            if sharded:
                from zig_gpt2_tpu.parallel import shard_kernels as sk

                attn = sk.decode_attention_quant_deferred_sharded(
                    q, kq, ks, vq, vs,
                    caches["k"], caches["k_scale"],
                    caches["v"], caches["v_scale"],
                    pos, idx, mesh=config.mesh, interpret=_spmd_interpret(),
                )
            else:
                from zig_gpt2_tpu.ops import attention as fused

                attn = fused.decode_attention_quant_deferred_fused(
                    q, kq, ks, vq, vs,
                    caches["k"], caches["k_scale"],
                    caches["v"], caches["v_scale"],
                    pos, layer=idx, packed=packed,
                    interpret=_fused_interpret(), start=ring_start,
                )
        caches["k"] = _put_row_stacked(caches["k"], kq, idx, wpos)
        caches["v"] = _put_row_stacked(caches["v"], vq, idx, wpos)
        caches["k_scale"] = _put_scale_stacked(caches["k_scale"], ks, idx, wpos)
        caches["v_scale"] = _put_scale_stacked(caches["v_scale"], vs, idx, wpos)
        if not deferred:
            attn = _decode_attention_quant(q, caches, idx, pos + 1, config,
                                           start=ring_start)
    else:
        if packed:
            k, v = fused_mod.pack_heads_rows(k), fused_mod.pack_heads_rows(v)
        if deferred:
            if sharded:
                from zig_gpt2_tpu.parallel import shard_kernels as sk

                attn = sk.decode_attention_deferred_sharded(
                    q, k, v, caches["k"], caches["v"], pos, idx,
                    mesh=config.mesh, interpret=_spmd_interpret(),
                )
            else:
                from zig_gpt2_tpu.ops import attention as fused

                attn = fused.decode_attention_deferred_fused(
                    q, k, v, caches["k"], caches["v"], pos, layer=idx,
                    packed=packed, interpret=_fused_interpret(),
                    start=ring_start,
                )
        caches["k"] = _put_row_stacked(caches["k"], k, idx, wpos)
        caches["v"] = _put_row_stacked(caches["v"], v, idx, wpos)
        if not deferred:
            attn = _decode_attention(q, caches, idx, pos + 1, config,
                                     start=ring_start)
    if packed:
        # (B, Hp, 2D) -> (B, hpad, D), drop the phantom head if any.
        attn = fused_mod.unpack_heads_rows(attn)[:, :H]
    attn = attn.reshape(x.shape[0], -1)
    x = x + _linear_at(blocks["attn"]["c_proj"], attn, idx, config, role="row")
    ln2 = _layer_slice(blocks["ln_2"], idx)
    h = ops.layer_norm(x, ln2["w"], ln2["b"], config.layer_norm_eps)
    h = _linear_at(blocks["mlp"]["c_fc"], h, idx, config, role="col")
    h = ops.gelu(h)
    x = x + _linear_at(blocks["mlp"]["c_proj"], h, idx, config, role="row")
    return x, caches


def _lm_head(params: Params, x: jax.Array, config: GPTConfig) -> jax.Array:
    """Tied lm_head: logits = x @ wte^T, no bias (main.zig:312). When the
    vocab is padded for sharding, the padded tail is masked so sampling can
    never pick a phantom token."""
    if "lm_head" in params:  # untied / quantized override
        p = params["lm_head"]
        rows = x.size // x.shape[-1]
        if (("qw" in p or "qw4" in p)
                and rows <= _qmm_cap(config, "qw4" in p)
                and _use_sharded_kernels(config)):
            # Vocab(column)-parallel sharded GEMV — the single biggest
            # decode matmul keeps its Pallas kernel under the mesh.
            from zig_gpt2_tpu.parallel import shard_kernels as sk

            int4 = "qw4" in p
            qw = p["qw4"] if int4 else p["qw"]
            y = sk.qmm_sharded(
                x.reshape(rows, x.shape[-1]), qw, p["scale"], int4=int4,
                role="col", mesh=config.mesh, interpret=_spmd_interpret(),
                w8a8=config.act_quant,
            )
            logits = y.astype(x.dtype).reshape(*x.shape[:-1], qw.shape[-1])
            if "b" in p:
                logits = logits + p["b"]
        else:
            logits = _linear(p, x, config.spmd, config.act_quant)
    else:
        logits = jnp.dot(x, params["wte"].T, preferred_element_type=x.dtype)
    if config.padded_vocab_size is not None:
        # Mask phantom (padding) vocab rows. Inside the step-level shard_map
        # body (config.manual_axis) the logits are this shard's contiguous
        # vocab slice — offset local columns to global ids first.
        vl = logits.shape[-1]
        vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (1, vl), 1).reshape(vl)
        if config.manual_axis is not None:
            vocab_ids = vocab_ids + jax.lax.axis_index(config.manual_axis) * vl
        logits = jnp.where(
            vocab_ids < config.vocab_size, logits, jnp.asarray(ops.MASK_VALUE, logits.dtype)
        )
    return logits


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------

def forward(
    params: Params, tokens: jax.Array, config: GPTConfig, remat: bool = False
) -> jax.Array:
    """Full-sequence forward: (B, T) int32 tokens -> (B, T, vocab) logits.

    Used for perplexity eval, training, and end-to-end parity with the
    PyTorch oracle (reference: generate_nano_gpt.py full-sequence forward).
    ``remat=True`` checkpoints each block (recompute activations in the
    backward pass — the standard HBM-for-FLOPs trade under scan, letting
    training batches grow ~L× beyond what stored activations allow).
    """
    B, T = tokens.shape
    pos = jnp.arange(T)
    x = ops.embedding(tokens, params["wte"]) + ops.embedding(pos, params["wpe"])

    def step(x, bp):
        x, _, _ = _block_prefill(x, bp, config, length_mask=None)
        return x, None

    if remat:
        step = jax.checkpoint(step)
    x, _ = jax.lax.scan(step, x, params["blocks"])
    x = ops.layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"], config.layer_norm_eps)
    return _lm_head(params, x, config)


def prefill(
    params: Params,
    cache: KVCache,
    tokens: jax.Array,
    lengths: jax.Array,
    config: GPTConfig,
) -> Tuple[KVCache, jax.Array]:
    """Process a (padded) prompt batch in one pass, filling the KV cache.

    Args:
      tokens: (B, T) int32, right-padded to a static T.
      lengths: (B,) int32 true prompt lengths (1 <= length <= T).

    Returns (cache, last_logits) where last_logits is (B, vocab) at each
    sequence's final prompt position. The lm_head runs only on that one
    position per sequence (the reference's compute_logits=false prefill
    optimization, main.zig:192-194, batched).
    """
    B, T = tokens.shape
    pos = jnp.arange(T)
    x = ops.embedding(tokens, params["wte"]) + ops.embedding(pos, params["wpe"])
    length_mask = pos[None, :] < lengths[:, None]  # (B, T)

    layer_caches = {name: c for name, c in cache.items() if name != "length"}

    def step(carry, xs):
        x, caches = carry
        bp, idx = xs  # weights stay as xs here: prefill amortizes the
        # per-layer slice over the whole prompt (decode does not — see
        # decode_step, which closes over the stacked weights instead).
        x, k, v = _block_prefill(x, bp, config, length_mask=length_mask)
        caches = dict(caches)

        if config.kv_packed:
            # Pack (B, H, T, D) -> (B, Hp, T, 2D) for the packed cache (a
            # one-time transpose, amortized over the whole prompt); pad the
            # zero phantom head first when H is odd. Packing happens BEFORE
            # quantization so INT8 scales come out per packed row (per
            # head PAIR — the packed-layout quantization semantics).
            from zig_gpt2_tpu.ops import attention as fused_mod

            hpad, _hp = _packed_heads(config)
            if hpad != k.shape[1]:
                zpad = ((0, 0), (0, hpad - k.shape[1]), (0, 0), (0, 0))
                k, v = jnp.pad(k, zpad), jnp.pad(v, zpad)
            k, v = fused_mod.pack_heads_seq(k), fused_mod.pack_heads_seq(v)

        def put(stack, rows):  # write the first T rows of layer idx in place
            start = (idx,) + (0,) * (stack.ndim - 1)
            return jax.lax.dynamic_update_slice(
                stack, rows[None].astype(stack.dtype), start
            )

        if "k_scale" in caches:  # INT8 cache: quantize on append
            kq, ks = ops.quantize_kv(k)  # per-row: per head, or per pair
            vq, vs = ops.quantize_kv(v)  # when the rows are packed
            caches["k"], caches["v"] = put(caches["k"], kq), put(caches["v"], vq)
            caches["k_scale"] = put(caches["k_scale"], ks)
            caches["v_scale"] = put(caches["v_scale"], vs)
        else:
            caches["k"], caches["v"] = put(caches["k"], k), put(caches["v"], v)
        return (x, caches), None

    (x, new_layer_caches), _ = jax.lax.scan(
        step, (x, layer_caches),
        (params["blocks"], jnp.arange(config.n_layers)),
    )
    x = ops.layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"], config.layer_norm_eps)
    # Gather each sequence's last valid hidden state, then one lm_head GEMM.
    last = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)[:, 0]
    logits = _lm_head(params, last, config)
    new_cache = dict(new_layer_caches, length=lengths)
    return new_cache, logits


def decode_step(
    params: Params,
    cache: KVCache,
    tokens: jax.Array,
    config: GPTConfig,
) -> Tuple[KVCache, jax.Array]:
    """One autoregressive step: (B,) tokens -> (cache', (B, vocab) logits).

    The per-token hot loop (reference: GPT.forward, main.zig:178-196). Jit
    this with ``donate_argnums`` on the cache for in-place HBM updates.
    """
    pos = cache["length"]  # (B,) index of the incoming token
    ring = config.ring_cache
    rows = cache["k"].shape[-2]
    # Ring: clamp idle lanes' runaway positions out of the wpe table (live
    # lanes retire before the window; linear mode relies on dus clamping).
    wpe_pos = jnp.minimum(pos, params["wpe"].shape[0] - 1) if ring else pos
    x = _embed_tokens(params["wte"], tokens, config) + ops.embedding(
        wpe_pos, params["wpe"]
    )
    meta = ("length", "start", "wptr")
    layer_caches = {name: c for name, c in cache.items() if name not in meta}
    ring_state = (cache["start"], cache["wptr"]) if ring else None
    blocks = params["blocks"]  # closure-invariant: scan never slices weights

    def step(carry, idx):
        x, caches = carry
        x, caches = _block_decode(x, blocks, idx, caches, pos, config,
                                  ring_state=ring_state)
        return (x, caches), None

    # Unrolling trades compile time for the TPU while-loop's per-iteration
    # sequencer overhead — measured ~15 us/iteration EVEN FOR A SCALAR ADD
    # on this chip, i.e. ~0.7 ms/step hidden in a 48-layer scan.
    # ZG2_DECODE_UNROLL tunes it (read at trace time). Default 12 from the
    # round-4 sweep: 124M B=1 u4 1162.7 / u12 1363.8 (+17%, full unroll of
    # its 12 layers) / u16 1263.5 / u32 1178.8; 1.5B B=16 flat (±0.5%).
    unroll = max(1, int(os.environ.get("ZG2_DECODE_UNROLL", "12")))
    (x, new_layer_caches), _ = jax.lax.scan(
        step, (x, layer_caches), jnp.arange(config.n_layers),
        unroll=min(unroll, config.n_layers),
    )
    x = ops.layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"], config.layer_norm_eps)
    logits = _lm_head(params, x, config)
    if ring:
        # Length clamps at rows-1: a live lane's interval never reaches the
        # full ring (retirement guarantees it; the clamp contains idle
        # lanes so the interval mask can't wrap onto the write row).
        new_cache = dict(
            new_layer_caches,
            length=jnp.minimum(pos + 1, rows - 1),
            start=cache["start"],
            wptr=(cache["wptr"] + 1) % rows,
        )
    else:
        new_cache = dict(new_layer_caches, length=pos + 1)
    return new_cache, logits


def _block_extend(
    x: jax.Array,
    blocks: Params,
    idx: jax.Array,
    caches: Dict[str, jax.Array],
    base: jax.Array,
    valid: jax.Array,
    config: GPTConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One transformer block over a small T-token WINDOW appended to the
    stacked KV cache at per-lane offsets — the speculative-decode verify /
    catch-up path (runtime/speculative.py). Same weight handling as
    _block_decode (stacked closure weights, _linear_at with the wmm/qmm
    GEMV kernels up to rows = B*T <= quant.kernels.GEMV_MAX_ROWS, jnp
    dequant beyond), but T query rows per pass, so the weights stream
    from HBM ONCE per window instead of once per token.

    Attention is append-then-attend over the full cache via
    ops.extend_attention — the window's causal structure falls out of the
    column mask, and T is tiny (k+1 draft tokens) so the plain-XLA einsum
    path is not worth a Pallas variant.

    The head-pair-PACKED cache layout (config.kv_packed) is supported:
    the window's K/V pack on append (pack_heads_seq — a tiny-window
    transpose) and the attention einsum runs over UNPACKED VIEWS of the
    cache (one transposed read of the valid region per layer). Packing
    buys nothing *inside* extend — no fused kernel runs here — but it
    lets a cache that mostly serves fused packed decode_steps (the
    speculative DRAFT, the batcher's verify path) take extend calls
    without a relayout. A cache that ONLY ever sees extend should stay
    unpacked (runtime/speculative.py keeps the target unpacked for this
    reason).

    Args:
      x: (B, T, E) window hidden states.
      base: (B,) int32 valid cache rows before the window.
      valid: (B,) int32 valid window rows (<= T); padding rows are
        appended (then overwritten later) but masked from attention.
    """
    assert config.manual_axis is None, "extend path is single-device only"
    B, T, _ = x.shape
    ln1 = _layer_slice(blocks["ln_1"], idx)
    h = ops.layer_norm(x, ln1["w"], ln1["b"], config.layer_norm_eps)
    H = config.attn_heads

    def heads(t):
        return t.reshape(*t.shape[:-1], H, t.shape[-1] // H)

    if "wqkv" in blocks["attn"]:  # fused projection (fuse_qkv_params)
        qkv = _linear_at(blocks["attn"]["wqkv"], h, idx, config)
        q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = heads(_linear_at(blocks["attn"]["wq"], h, idx, config))
        k = heads(_linear_at(blocks["attn"]["wk"], h, idx, config))
        v = heads(_linear_at(blocks["attn"]["wv"], h, idx, config))
    q, k, v = (t.swapaxes(1, 2) for t in (q, k, v))  # (B, H, T, D)

    packed = config.kv_packed
    if packed:
        from zig_gpt2_tpu.ops import attention as fused_mod

        hpad, _hp = _packed_heads(config)
        if hpad != H:  # zero phantom head (q stays at H: we attend over
            zpad = ((0, 0), (0, hpad - H), (0, 0), (0, 0))  # unpacked views)
            k = jnp.pad(k, zpad)
            v = jnp.pad(v, zpad)
        # Pack the window BEFORE quantization (per-pair scales, exactly
        # like _block_decode/prefill — one layout, one scale semantics).
        k, v = fused_mod.pack_heads_seq(k), fused_mod.pack_heads_seq(v)

    # The window is CONTIGUOUS in S per lane, so each (H, T, D) block (or
    # (H, T) scale plane) lands in ONE dynamic_update_slice per lane —
    # not T row-appends (same per-batch unroll rule as _put_row_stacked:
    # never vmap dus over a non-leading axis).
    def put_window(stack, win, s_last=False):
        # win rows land at base[b]. s_last: the stack's S axis is its LAST
        # dim (scale planes); otherwise S is second-to-last (k/v blocks
        # with a trailing feature dim).
        for i in range(win.shape[0]):
            upd = win[i][None, None].astype(stack.dtype)
            if s_last:
                start = (idx, i) + (0,) * (stack.ndim - 3) + (base[i],)
            else:
                start = (idx, i) + (0,) * (stack.ndim - 4) + (base[i], 0)
            stack = jax.lax.dynamic_update_slice(stack, upd, start)
        return stack

    def cache_at(name):
        c = jax.lax.dynamic_index_in_dim(caches[name], idx, 0, keepdims=False)
        if not packed:
            return c
        if name.endswith("_scale"):  # per-pair (B, Hp, S) -> (B, H, S)
            return fused_mod.unpack_pair_scales_seq(c)[:, :H]
        return fused_mod.unpack_heads_seq(c)[:, :H]  # (B,Hp,S,2D)->(B,H,S,D)

    caches = dict(caches)
    if "k_scale" in caches:  # INT8 cache: quantize the window on append
        kq, ks = ops.quantize_kv(k)  # per-row: per head, or per pair when
        vq, vs = ops.quantize_kv(v)  # the window is packed
        caches["k"] = put_window(caches["k"], kq)
        caches["v"] = put_window(caches["v"], vq)
        caches["k_scale"] = put_window(caches["k_scale"], ks, s_last=True)
        caches["v_scale"] = put_window(caches["v_scale"], vs, s_last=True)
        attn = ops.extend_attention_quant(
            q, cache_at("k"), cache_at("k_scale"),
            cache_at("v"), cache_at("v_scale"), base, valid)
    else:
        caches["k"] = put_window(caches["k"], k)
        caches["v"] = put_window(caches["v"], v)
        attn = ops.extend_attention(q, cache_at("k"), cache_at("v"),
                                    base, valid)
    attn = attn.swapaxes(1, 2).reshape(B, T, -1)
    x = x + _linear_at(blocks["attn"]["c_proj"], attn, idx, config, role="row")
    ln2 = _layer_slice(blocks["ln_2"], idx)
    h = ops.layer_norm(x, ln2["w"], ln2["b"], config.layer_norm_eps)
    h = _linear_at(blocks["mlp"]["c_fc"], h, idx, config, role="col")
    h = ops.gelu(h)
    x = x + _linear_at(blocks["mlp"]["c_proj"], h, idx, config, role="row")
    return x, caches


def extend(
    params: Params,
    cache: KVCache,
    tokens: jax.Array,
    valid: jax.Array,
    config: GPTConfig,
) -> Tuple[KVCache, jax.Array]:
    """Multi-token cache-extending forward: process a (B, T) token window
    starting at each lane's ``cache["length"]`` and return logits at EVERY
    window position — T sequential decode_steps' worth of logits for one
    weight-streaming pass. This is the speculative-decode primitive
    (runtime/speculative.py): the target model verifies k draft tokens (+1
    bonus) per call; the draft model uses it to catch up on committed
    tokens it has not processed.

    Args:
      tokens: (B, T) int32, right-padded per lane to the static T.
      valid: (B,) int32 true window lengths (1 <= valid <= T). Padding
        rows ARE appended to the cache (and masked from attention) but not
        counted: the returned cache's length advances by ``valid``, so
        later appends overwrite them.

    Returns (cache, logits) with logits (B, T, vocab); row i is the
    next-token distribution after consuming tokens[:, :i+1]. Rows at or
    beyond ``valid`` are garbage — callers gather only valid positions.
    The cache must have >= T rows of headroom past every lane's length.
    """
    base = cache["length"]
    B, T = tokens.shape
    # Clamp padding-row positions into the wpe table (real rows are in
    # range by the headroom contract; padding rows may run past it).
    pos = jnp.minimum(base[:, None] + jnp.arange(T)[None, :],
                      params["wpe"].shape[0] - 1)
    x = ops.embedding(tokens, params["wte"]) + ops.embedding(pos, params["wpe"])
    layer_caches = {name: c for name, c in cache.items() if name != "length"}
    blocks = params["blocks"]  # closure-invariant: scan never slices weights

    def step(carry, idx):
        x, caches = carry
        x, caches = _block_extend(x, blocks, idx, caches, base, valid, config)
        return (x, caches), None

    unroll = max(1, int(os.environ.get("ZG2_DECODE_UNROLL", "12")))
    (x, new_layer_caches), _ = jax.lax.scan(
        step, (x, layer_caches), jnp.arange(config.n_layers),
        unroll=min(unroll, config.n_layers),
    )
    x = ops.layer_norm(x, params["ln_f"]["w"], params["ln_f"]["b"], config.layer_norm_eps)
    logits = _lm_head(params, x, config)
    new_cache = dict(new_layer_caches, length=base + valid)
    return new_cache, logits


def make_decode_step(config: GPTConfig):
    """Jitted decode step with the KV cache donated (zero-allocation steady
    state — the TPU analogue of the reference's State arena)."""
    fn = functools.partial(decode_step, config=config)
    return jax.jit(fn, donate_argnums=(1,))


def make_prefill(config: GPTConfig):
    fn = functools.partial(prefill, config=config)
    return jax.jit(fn, donate_argnums=(1,))

"""Pallas TPU kernel: fused single-token decode attention over the KV cache.

One kernel per batch-element grid cell computes the whole decode-attention
pipeline — scores = q·Kᵀ/√D, length-mask, f32 softmax, out = probs·V — for
every head, with the (H, S, D) K/V tiles streamed HBM→VMEM once and nothing
round-tripping through HBM in between. The head loop is a static Python
unroll (H ≤ 25 for the GPT-2 family): per head one NT dot (1,D)·(S,D)ᵀ, a
masked f32 softmax, and one NN dot (1,S)·(S,D), all MXU/VPU-resident.

This replaces the reference's per-head sgemm → softmax → sgemm sequence
(ops.zig:249-307) and its per-step full-cache transpose (ops.zig:151-158):
the cache is already (B, H, S, D), the query length is 1, so no causal mask
is needed — only the valid-length mask (SURVEY.md §7 hard part 4:
fixed-shape cache + length mask instead of the reference's dynamic slices).

Block-shape note: grid cells take whole (1, H, S, D) slabs — TPU Pallas
requires the last two block dims to be sublane/lane-aligned or equal to the
array dims, which rules out per-head (1, 1, S, D) blocks with H > 1 on the
second-to-last-of-three axes.

Two variants share the math:
- ``decode_attention_fused``      — bf16/f32 cache.
- ``decode_attention_quant_fused``— INT8 cache with per-(token, head) f32
  scales; dequantization is folded in (K scale multiplies the score row,
  V scale folds into the probabilities) — int8 never materializes in HBM.

Per-sequence valid lengths arrive via scalar prefetch (SMEM). The jnp
reference implementations live in ops/layers.py; parity is tested in
interpret mode (tests/test_attention_kernel.py); dispatch happens in
models/gpt2.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_gpt2_tpu.ops.layers import MASK_VALUE


def _softmax_masked(scores: jax.Array, length: jax.Array) -> jax.Array:
    """(H, S) f32 scores -> masked, numerically-stable softmax probs,
    vectorized over the head rows."""
    h, s = scores.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (h, s), 1)
    scores = jnp.where(ids < length, scores, MASK_VALUE)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# S-chunk size for the online-softmax loops: bounds the f32 temporaries to
# (H, _SC, D) regardless of cache length (whole-S f32 temps blow the 16 MB
# VMEM budget at S >= ~512 for 25 heads). Multiple of 128 so every chunk
# boundary is tile-aligned.
_SC = 256


def _attend(q: jax.Array, k: jax.Array, v: jax.Array,
            score_scale: jax.Array, prob_scale, length, out_dtype) -> jax.Array:
    """All-heads decode attention on the VPU, online-softmax over S-chunks.

    q: (H, D), k/v: (H, S, D) — query length is 1, so q·Kᵀ is a
    broadcast-multiply + lane reduction and probs·V a broadcast-multiply +
    sublane reduction per chunk, with the standard running (max, denom, acc)
    rescaling between chunks (flash-attention recurrence, trivially exact
    for one query). The MXU sees none of it: per-head GEMVs are
    latency-bound systolic passes (profiled 2x slower than this).
    score_scale: (H, S) or scalar factor applied to raw scores (carries both
    1/sqrt(D) and the INT8 K scales). prob_scale: None or (H, S) V scales —
    they weight the V sum only, never the softmax denominator.

    All math in f32 on the VPU. (A bf16-multiply variant — exact for the
    int8 cache values — fails to lower: the bf16->f32 convert of the 3-D
    product is an "unsupported shape cast" in Mosaic.)
    """
    h, s_total, d = k.shape
    qf = q.astype(jnp.float32)
    m = jnp.full((h, 1), MASK_VALUE, jnp.float32)
    den = jnp.zeros((h, 1), jnp.float32)
    acc = jnp.zeros((h, d), jnp.float32)
    for c0 in range(0, s_total, _SC):
        sc_len = min(_SC, s_total - c0)
        kc = jax.lax.slice_in_dim(k, c0, c0 + sc_len, axis=1).astype(jnp.float32)
        scores = jnp.sum(kc * qf[:, None, :], axis=-1)  # (H, Sc)
        if hasattr(score_scale, "ndim") and getattr(score_scale, "ndim", 0) == 2:
            scores = scores * jax.lax.slice_in_dim(score_scale, c0, c0 + sc_len, axis=1)
        else:
            scores = scores * score_scale
        ids = c0 + jax.lax.broadcasted_iota(jnp.int32, (h, sc_len), 1)
        valid = ids < length
        scores = jnp.where(valid, scores, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # (H, Sc)
        den = den * corr + jnp.sum(e, axis=-1, keepdims=True)
        if prob_scale is not None:
            e = e * jax.lax.slice_in_dim(prob_scale, c0, c0 + sc_len, axis=1)
        vc = jax.lax.slice_in_dim(v, c0, c0 + sc_len, axis=1).astype(jnp.float32)
        acc = acc * corr + jnp.sum(e[:, :, None] * vc, axis=1)
        m = m_new
    return (acc / den).astype(out_dtype)


def _attend_with_self(
    q, k, v, k_new, v_new, score_scale, self_score_scale,
    prob_scale, self_prob_scale, length, out_dtype,
):
    """Decode attention over ``length`` OLD cache rows plus an explicit
    self-term for the token being decoded, whose K/V row has NOT been
    written to the cache yet.

    Mathematically identical to append-then-attend over length+1 rows, but
    the kernel never reads the appended row — so the XLA cache append and
    this custom call have no read-after-write dependency. Same online
    S-chunked recurrence as _attend, seeded with the self term: the running
    max starts at the self score, the denominator at exp(0) = 1, and the
    accumulator at (self V scale ·) v_new.

    Shapes: q/k_new/v_new (H, D); k/v (H, S, D); scales (H, S) / (H, 1).
    """
    h, s_total, d = k.shape
    qf = q.astype(jnp.float32)
    self_s = jnp.sum(
        k_new.astype(jnp.float32) * qf, axis=-1, keepdims=True
    ) * self_score_scale                                   # (H, 1)
    m = self_s
    den = jnp.ones((h, 1), jnp.float32)                    # exp(self - m) = 1
    acc = v_new.astype(jnp.float32)
    if self_prob_scale is not None:
        acc = acc * self_prob_scale
    for c0 in range(0, s_total, _SC):
        sc_len = min(_SC, s_total - c0)
        kc = jax.lax.slice_in_dim(k, c0, c0 + sc_len, axis=1).astype(jnp.float32)
        scores = jnp.sum(kc * qf[:, None, :], axis=-1)
        if hasattr(score_scale, "ndim") and getattr(score_scale, "ndim", 0) == 2:
            scores = scores * jax.lax.slice_in_dim(score_scale, c0, c0 + sc_len, axis=1)
        else:
            scores = scores * score_scale
        ids = c0 + jax.lax.broadcasted_iota(jnp.int32, (h, sc_len), 1)
        valid = ids < length
        scores = jnp.where(valid, scores, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        den = den * corr + jnp.sum(e, axis=-1, keepdims=True)
        if prob_scale is not None:
            e = e * jax.lax.slice_in_dim(prob_scale, c0, c0 + sc_len, axis=1)
        vc = jax.lax.slice_in_dim(v, c0, c0 + sc_len, axis=1).astype(jnp.float32)
        acc = acc * corr + jnp.sum(e[:, :, None] * vc, axis=1)
        m = m_new
    return (acc / den).astype(out_dtype)


def _lengths_for(q: jax.Array, length) -> jax.Array:
    length = jnp.asarray(length, jnp.int32)
    if length.ndim == 0:
        length = jnp.broadcast_to(length, (q.shape[0],))
    return length


def _q_spec(h, d, stacked):
    if stacked:
        return pl.BlockSpec((1, h, d), lambda i, ln, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, d), lambda i, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _cache_spec(h, s, d, stacked):
    """Cache block. Stacked mode indexes the (L, B, H, S, D) scan-stacked
    cache directly with the scalar-prefetched layer index — no per-layer
    slice materialization in HBM."""
    if stacked:
        return pl.BlockSpec((1, 1, h, s, d),
                            lambda i, ln, idx: (idx[0], i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, s, d), lambda i, ln: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _scale_spec(h, s, stacked):
    """Scale-plane block over the RAW (…, H, S) arrays. (An earlier version
    reshaped to (…, H, 1, S) to slice per-head rows — that inserted size-1
    sublane dim forced XLA to materialize an 8x-padded operand copy of both
    scale planes per layer, ~2.9 ms/step each at 1.5B B=16.)"""
    if stacked:
        return pl.BlockSpec((1, 1, h, s),
                            lambda i, ln, idx: (idx[0], i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, s), lambda i, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _squeeze_layer(val, stacked):
    return val[0] if stacked else val


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_fused(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    length: jax.Array,
    *,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """Fused decode attention. q: (B, H, D); caches: (B, H, S, D);
    length: scalar or (B,) valid rows. Returns (B, H, D) in q.dtype.

    Stacked mode (``layer`` given): caches are the full scan-stacked
    (L, B, H, S, D) arrays and the traced layer index selects the layer in
    the index map (scalar prefetch) — no per-layer slice materialization."""
    stacked = layer is not None
    b, h, d = q.shape
    s = k_cache.shape[-2]
    scale = 1.0 / math.sqrt(d)

    def kernel(*refs):
        if stacked:
            len_ref, _idx_ref, q_ref, k_ref, v_ref, out_ref = refs
        else:
            len_ref, q_ref, k_ref, v_ref, out_ref = refs
        n = len_ref[pl.program_id(0)]
        k_all = _squeeze_layer(k_ref[:], stacked)[0]   # (H, S, D)
        v_all = _squeeze_layer(v_ref[:], stacked)[0]
        out_ref[0] = _attend(
            q_ref[0], k_all, v_all, scale, None, n, out_ref.dtype
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(b,),
        in_specs=[
            _q_spec(h, d, stacked),
            _cache_spec(h, s, d, stacked),
            _cache_spec(h, s, d, stacked),
        ],
        out_specs=_q_spec(h, d, stacked),
    )
    args = [_lengths_for(q, length)]
    if stacked:
        args.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    args += [q, k_cache, v_cache]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_quant_fused(
    q: jax.Array,
    k_cache: jax.Array,
    k_scale: jax.Array,
    v_cache: jax.Array,
    v_scale: jax.Array,
    length: jax.Array,
    *,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """Fused decode attention over an INT8 cache. q: (B, H, D);
    k_cache/v_cache: (B, H, S, D) int8; k_scale/v_scale: (B, H, S) f32.
    Stacked mode as in decode_attention_fused (scales then (L, B, H, S))."""
    stacked = layer is not None
    b, h, d = q.shape
    s = k_cache.shape[-2]
    scale = 1.0 / math.sqrt(d)

    def kernel(*refs):
        if stacked:
            len_ref, _idx_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref = refs
        else:
            len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref = refs
        n = len_ref[pl.program_id(0)]
        k_all = _squeeze_layer(k_ref[:], stacked)[0]           # (H, S, D) int8
        v_all = _squeeze_layer(v_ref[:], stacked)[0]
        ks_all = _squeeze_layer(ks_ref[:], stacked)[0]  # (H, S)
        vs_all = _squeeze_layer(vs_ref[:], stacked)[0]
        out_ref[0] = _attend(
            q_ref[0], k_all, v_all,
            ks_all.astype(jnp.float32) * scale,
            vs_all.astype(jnp.float32), n, out_ref.dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(b,),
        in_specs=[
            _q_spec(h, d, stacked),
            _cache_spec(h, s, d, stacked), _scale_spec(h, s, stacked),
            _cache_spec(h, s, d, stacked), _scale_spec(h, s, stacked),
        ],
        out_specs=_q_spec(h, d, stacked),
    )
    args = [_lengths_for(q, length)]
    if stacked:
        args.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    args += [q, k_cache, k_scale, v_cache, v_scale]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(*args)


def _row_spec(h, d, stacked):
    """(B, H, D) per-token rows (q / k_new / v_new)."""
    return _q_spec(h, d, stacked)


def _srow_spec(h, stacked):
    """(B, H, 1) per-token scale rows."""
    if stacked:
        return pl.BlockSpec((1, h, 1), lambda i, ln, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, 1), lambda i, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_deferred_fused(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    length: jax.Array,
    *,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """Fused decode attention over ``length`` OLD rows + the un-appended
    current token (see _attend_with_self). q/k_new/v_new: (B, H, D);
    caches: (B, H, S, D) — stacked (L, B, H, S, D) when ``layer`` given;
    length: (B,) count of rows already in the cache (== current position)."""
    stacked = layer is not None
    b, h, d = q.shape
    s = k_cache.shape[-2]
    scale = 1.0 / math.sqrt(d)

    def kernel(*refs):
        if stacked:
            len_ref, _idx, q_ref, kn_ref, vn_ref, k_ref, v_ref, out_ref = refs
        else:
            len_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, out_ref = refs
        n = len_ref[pl.program_id(0)]
        k_all = _squeeze_layer(k_ref[:], stacked)[0]
        v_all = _squeeze_layer(v_ref[:], stacked)[0]
        out_ref[0] = _attend_with_self(
            q_ref[0], k_all, v_all, kn_ref[0], vn_ref[0],
            scale, scale, None, None, n, out_ref.dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(b,),
        in_specs=[
            _row_spec(h, d, stacked), _row_spec(h, d, stacked),
            _row_spec(h, d, stacked),
            _cache_spec(h, s, d, stacked), _cache_spec(h, s, d, stacked),
        ],
        out_specs=_q_spec(h, d, stacked),
    )
    args = [_lengths_for(q, length)]
    if stacked:
        args.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    args += [q, k_new.astype(q.dtype), v_new.astype(q.dtype), k_cache, v_cache]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_quant_deferred_fused(
    q: jax.Array,
    k_new: jax.Array,
    ks_new: jax.Array,
    v_new: jax.Array,
    vs_new: jax.Array,
    k_cache: jax.Array,
    k_scale: jax.Array,
    v_cache: jax.Array,
    v_scale: jax.Array,
    length: jax.Array,
    *,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """Deferred-append decode attention over an INT8 cache. k_new/v_new are
    the already-quantized (B, H, D) int8 rows with (B, H) scales — the same
    values the cache append will store, so the math is bit-identical to
    append-then-attend."""
    stacked = layer is not None
    b, h, d = q.shape
    s = k_cache.shape[-2]
    scale = 1.0 / math.sqrt(d)

    def kernel(*refs):
        if stacked:
            (len_ref, _idx, q_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
             k_ref, ks_ref, v_ref, vs_ref, out_ref) = refs
        else:
            (len_ref, q_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
             k_ref, ks_ref, v_ref, vs_ref, out_ref) = refs
        n = len_ref[pl.program_id(0)]
        k_all = _squeeze_layer(k_ref[:], stacked)[0]
        v_all = _squeeze_layer(v_ref[:], stacked)[0]
        ks_all = _squeeze_layer(ks_ref[:], stacked)[0].astype(jnp.float32)
        vs_all = _squeeze_layer(vs_ref[:], stacked)[0].astype(jnp.float32)
        ksn = ksn_ref[0].astype(jnp.float32)  # (H, 1)
        vsn = vsn_ref[0].astype(jnp.float32)
        out_ref[0] = _attend_with_self(
            q_ref[0], k_all, v_all, kn_ref[0], vn_ref[0],
            ks_all * scale, ksn * scale, vs_all, vsn, n, out_ref.dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(b,),
        in_specs=[
            _row_spec(h, d, stacked), _row_spec(h, d, stacked),
            _srow_spec(h, stacked),
            _row_spec(h, d, stacked), _srow_spec(h, stacked),
            _cache_spec(h, s, d, stacked), _scale_spec(h, s, stacked),
            _cache_spec(h, s, d, stacked), _scale_spec(h, s, stacked),
        ],
        out_specs=_q_spec(h, d, stacked),
    )
    args = [_lengths_for(q, length)]
    if stacked:
        args.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    args += [
        q, k_new, ks_new[..., None], v_new, vs_new[..., None],
        k_cache, k_scale, v_cache, v_scale,
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(*args)

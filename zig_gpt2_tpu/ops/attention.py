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


def _attend(q: jax.Array, k: jax.Array, v: jax.Array,
            score_scale: jax.Array, prob_scale, length, out_dtype) -> jax.Array:
    """All-heads decode attention on the VPU.

    q: (H, D), k/v: (H, S, D) — query length is 1, so q·Kᵀ is a
    broadcast-multiply + lane reduction and probs·V a broadcast-multiply +
    sublane reduction. The MXU sees none of it: per-head (1,D)·(D,S) dots
    are latency-bound systolic passes (profiled 2x slower than this), while
    the VPU crunches the whole (H, S, D) slab in a few vectorized passes.
    score_scale: (H, S) or scalar factor applied to raw scores (carries both
    1/sqrt(D) and the INT8 K scales). prob_scale: None or (H, S) V scales.
    """
    # All math in f32 on the VPU. (A bf16-multiply variant — exact for the
    # int8 cache values — fails to lower: the bf16->f32 convert of the 3-D
    # product is an "unsupported shape cast" in Mosaic, presumably the
    # (16,128)->(8,128) retiling of a large intermediate.)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.sum(kf * qf[:, None, :], axis=-1) * score_scale  # (H, S)
    probs = _softmax_masked(scores, length)
    if prob_scale is not None:
        probs = probs * prob_scale
    vf = v.astype(jnp.float32)
    out = jnp.sum(probs[:, :, None] * vf, axis=1)  # (H, D)
    return out.astype(out_dtype)


def _attend_with_self(
    q, k, v, k_new, v_new, score_scale, self_score_scale,
    prob_scale, self_prob_scale, length, out_dtype,
):
    """Decode attention over ``length`` OLD cache rows plus an explicit
    self-term for the token being decoded, whose K/V row has NOT been
    written to the cache yet.

    Mathematically identical to append-then-attend over length+1 rows, but
    the kernel never reads the appended row — so the XLA cache append and
    this custom call have no read-after-write dependency, and the append
    can stay a true in-place update (appending first forced XLA into
    copy-on-write of the cache around the custom call: ~2.9 ms/step of pure
    copies at 1.5B B=16).

    Shapes: q/k_new/v_new (H, D); k/v (H, S, D); scales (H, S) / (H, 1).
    The joint softmax is computed without concatenating the self column:
    shared max, separate exp sums.
    """
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    h, s, _ = k.shape
    scores = jnp.sum(kf * qf[:, None, :], axis=-1) * score_scale      # (H, S)
    self_s = jnp.sum(
        k_new.astype(jnp.float32) * qf, axis=-1, keepdims=True
    ) * self_score_scale                                               # (H, 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (h, s), 1)
    valid = ids < length
    scores = jnp.where(valid, scores, MASK_VALUE)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_s)
    e_old = jnp.where(valid, jnp.exp(scores - m), 0.0)                 # (H, S)
    e_self = jnp.exp(self_s - m)                                       # (H, 1)
    denom = jnp.sum(e_old, axis=-1, keepdims=True) + e_self
    if prob_scale is not None:
        e_old = e_old * prob_scale
        e_self = e_self * self_prob_scale
    vf = v.astype(jnp.float32)
    out = jnp.sum(e_old[:, :, None] * vf, axis=1)
    out = (out + e_self * v_new.astype(jnp.float32)) / denom           # (H, D)
    return out.astype(out_dtype)


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
    if stacked:
        return pl.BlockSpec((1, 1, h, 1, s),
                            lambda i, ln, idx: (idx[0], i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, 1, s), lambda i, ln: (i, 0, 0, 0),
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
        ks_all = _squeeze_layer(ks_ref[:], stacked)[0, :, 0, :]  # (H, S)
        vs_all = _squeeze_layer(vs_ref[:], stacked)[0, :, 0, :]
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
    if stacked:
        ks_in = k_scale[:, :, :, None, :]
        vs_in = v_scale[:, :, :, None, :]
    else:
        ks_in = k_scale[:, :, None, :]
        vs_in = v_scale[:, :, None, :]
    args = [_lengths_for(q, length)]
    if stacked:
        args.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    args += [q, k_cache, ks_in, v_cache, vs_in]
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
        ks_all = _squeeze_layer(ks_ref[:], stacked)[0, :, 0, :].astype(jnp.float32)
        vs_all = _squeeze_layer(vs_ref[:], stacked)[0, :, 0, :].astype(jnp.float32)
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
    if stacked:
        ks_in = k_scale[:, :, :, None, :]
        vs_in = v_scale[:, :, :, None, :]
    else:
        ks_in = k_scale[:, :, None, :]
        vs_in = v_scale[:, :, None, :]
    args = [_lengths_for(q, length)]
    if stacked:
        args.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    args += [
        q, k_new, ks_new[..., None], v_new, vs_new[..., None],
        k_cache, ks_in, v_cache, vs_in,
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(*args)

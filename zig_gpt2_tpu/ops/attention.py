"""Pallas TPU kernels: fused single-token decode attention over the KV cache.

Flash-decode structure: the grid is (batch, S-chunks); each grid step streams
one (H, _SC, D) K/V chunk HBM→VMEM and folds it into running online-softmax
state — max, denominator, and weighted-V accumulator — kept in VMEM scratch
(TPU grid steps execute sequentially per core, so scratch persists across the
chunk dimension). The last chunk writes the normalized output. Chunking is
what bounds VMEM: whole-S blocks for the (…, S, D=64) cache pad D to 128
lanes and blow the 16 MB scoped budget beyond ctx ≈ 512.

The math is all VPU: query length is 1, so q·Kᵀ is a broadcast-multiply +
lane reduction and probs·V a broadcast-multiply + sublane reduction per
chunk. The MXU is deliberately not used — per-head (1, D)·(D, S) GEMVs are
latency-bound systolic passes (profiled 2x slower), and Mosaic has no
batched dot_general. All arithmetic in f32 (int8 cache values are exact on
conversion; a bf16-multiply variant fails to lower: "unsupported shape
cast").

Four variants from one builder, selected statically:
- fp / INT8-cache (per-(token, head) f32 scales folded in: the K scale
  multiplies the score row, the V scale weights the V sum — never the
  softmax denominator; int8 never materializes in HBM).
- appended / DEFERRED-append: the deferred variants take the current
  token's K/V row (and scales) as separate inputs and fold an explicit
  self-term into the recurrence instead of reading the just-appended cache
  row — so the XLA cache append has no reader inside the step (the model
  uses these; see models/gpt2._block_decode).

Stacked mode: the caches are the full scan-stacked (L, B, H, S, D) arrays
and the traced layer index arrives via scalar prefetch, selecting the layer
inside the BlockSpec index maps — no per-layer slice materialization.
NOTE the scale planes are passed RAW as (…, H, S): reshaping them to
(…, H, 1, S) once cost 8x-padded operand copies every layer (size-1 sublane
dim).

This replaces the reference's per-head sgemm → softmax → sgemm sequence
(ops.zig:249-307) and its per-step full-cache transpose (ops.zig:151-158):
the cache stays (B, H, S, D) and only the valid-length mask is needed
(SURVEY.md §7 hard part 4 — fixed shapes + mask instead of dynamic slices).

The jnp reference implementations live in ops/layers.py; parity is tested
in interpret mode (tests/test_attention_kernel.py); dispatch happens in
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

# Inner compute chunk: the in-kernel loop slices the resident block in
# 128-row steps so the f32 temporaries (lane-padded to 128 like the blocks:
# ~3 x h*_INNER*128*4 bytes) stay bounded.
_INNER = 128
# VMEM budget for the K+V blocks of one grid step (bytes; double-buffered
# pairs must fit the 16 MB scoped budget together with the ~3 MB of f32
# inner-loop temporaries).
_BLOCK_BUDGET = 6 * 1024 * 1024


def _pick_chunk(h, s, itemsize) -> int:
    """Largest 256-multiple S-chunk whose K+V blocks (D padded to 128
    lanes, double-buffered) fit the budget. Minimizing the outer grid size
    matters enormously: extra grid steps measured ~3x slowdown at 1.5B
    B=16 ctx 640 (469 vs 1347 tok/s for 3 chunks vs 1), so common configs
    (INT8 cache up to ctx ~1500, bf16 124M up to ctx ~750) stay
    single-chunk and only genuinely oversized caches pay for chunking."""
    per_row = h * 128 * itemsize * 2 * 2  # K+V, double-buffered
    sc = max(_BLOCK_BUDGET // per_row, _INNER)
    sc = (sc // _INNER) * _INNER
    return min(sc, -(-s // _INNER) * _INNER)


def _lengths_for(q: jax.Array, length) -> jax.Array:
    length = jnp.asarray(length, jnp.int32)
    if length.ndim == 0:
        length = jnp.broadcast_to(length, (q.shape[0],))
    return length


def _row_spec(h, d, stacked):
    """Per-sequence (1, H, D) rows (q / k_new / v_new), chunk-invariant."""
    if stacked:
        return pl.BlockSpec((1, h, d), lambda i, j, ln, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, d), lambda i, j, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _srow_spec(h, stacked):
    """Per-sequence (1, H, 1) scale rows (deferred INT8 variants)."""
    if stacked:
        return pl.BlockSpec((1, h, 1), lambda i, j, ln, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, 1), lambda i, j, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _cache_spec(h, d, stacked, sc):
    """One (H, sc, D) cache block per grid step."""
    if stacked:
        return pl.BlockSpec((1, 1, h, sc, d),
                            lambda i, j, ln, idx: (idx[0], i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, sc, d), lambda i, j, ln: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)


def _plane_spec(h, stacked, sc):
    """One (H, sc) scale-plane block per grid step (raw (…, H, S) arrays)."""
    if stacked:
        return pl.BlockSpec((1, 1, h, sc),
                            lambda i, j, ln, idx: (idx[0], i, 0, j),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, sc), lambda i, j, ln: (i, 0, j),
                        memory_space=pltpu.VMEM)


def _inner_slice(ref, stacked, c0, ln, plane=False):
    """Static (H, ln, D) / (H, ln) slice of the resident block ref."""
    if plane:
        return ref[0, 0, :, c0:c0 + ln] if stacked else ref[0, :, c0:c0 + ln]
    return (ref[0, 0, :, c0:c0 + ln, :] if stacked
            else ref[0, :, c0:c0 + ln, :])


def _build_kernel(*, stacked, quant, deferred, h, d, n_chunks, sc, scale,
                  out_dtype):
    """One flash-decode kernel body covering all four variants."""

    def kernel(*args):
        if stacked:
            len_ref, _idx_ref, *refs = args
        else:
            len_ref, *refs = args
        it = iter(refs)
        q_ref = next(it)
        if deferred:
            kn_ref = next(it)
            ksn_ref = next(it) if quant else None
            vn_ref = next(it)
            vsn_ref = next(it) if quant else None
        k_ref = next(it)
        ks_ref = next(it) if quant else None
        v_ref = next(it)
        vs_ref = next(it) if quant else None
        out_ref = next(it)
        m_s, den_s, acc_s = next(it), next(it), next(it)

        i = pl.program_id(0)
        j = pl.program_id(1)
        n = len_ref[i]
        qf = q_ref[0].astype(jnp.float32)  # (H, D)

        # Running softmax state is carried as VALUES through the inner loop
        # (scratch read-modify-writes per iteration measured ~2.6x slower);
        # scratch is touched only at grid-step boundaries, and not at all
        # when the whole cache fits one grid step.
        if deferred:
            # Seed the recurrence with the self-term: running max = the
            # self score, denominator = exp(0) = 1, accumulator = the
            # (scaled) new V row.
            init_m = jnp.sum(
                kn_ref[0].astype(jnp.float32) * qf, axis=-1, keepdims=True
            ) * scale
            if quant:
                init_m = init_m * ksn_ref[0].astype(jnp.float32)
            init_den = jnp.ones((h, 1), jnp.float32)
            init_acc = vn_ref[0].astype(jnp.float32)
            if quant:
                init_acc = init_acc * vsn_ref[0].astype(jnp.float32)
        else:
            init_m = jnp.full((h, 1), MASK_VALUE, jnp.float32)
            init_den = jnp.zeros((h, 1), jnp.float32)
            init_acc = jnp.zeros((h, d), jnp.float32)
        if n_chunks == 1:
            m, den, acc = init_m, init_den, init_acc
        else:
            first = j == 0
            m = jnp.where(first, init_m, m_s[:])
            den = jnp.where(first, init_den, den_s[:])
            acc = jnp.where(first, init_acc, acc_s[:])

        # Inner loop over the resident block in _INNER-row steps: bounds
        # the f32 temporaries while the outer grid keeps DMA blocks big.
        for c0 in range(0, sc, _INNER):
            ln = min(_INNER, sc - c0)
            kc = _inner_slice(k_ref, stacked, c0, ln).astype(jnp.float32)
            scores = jnp.sum(kc * qf[:, None, :], axis=-1) * scale
            if quant:
                scores = scores * _inner_slice(
                    ks_ref, stacked, c0, ln, plane=True
                ).astype(jnp.float32)
            ids = j * sc + c0 + jax.lax.broadcasted_iota(jnp.int32, (h, ln), 1)
            valid = ids < n
            scores = jnp.where(valid, scores, MASK_VALUE)
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            e = jnp.where(valid, jnp.exp(scores - m_new), 0.0)   # (H, ln)
            den = den * corr + jnp.sum(e, axis=-1, keepdims=True)
            if quant:  # V scales weight the sum, never the denominator
                # Re-mask after the multiply: block padding is uninitialized
                # and 0 * NaN = NaN.
                e = jnp.where(valid, e * _inner_slice(
                    vs_ref, stacked, c0, ln, plane=True
                ).astype(jnp.float32), 0.0)
            vc = _inner_slice(v_ref, stacked, c0, ln).astype(jnp.float32)
            # Zero invalid V rows too (same NaN concern). Mask widened to
            # f32 first — Mosaic only supports non-no-op minor-dim inserts
            # on 32-bit types, not bool.
            validf = valid.astype(jnp.float32)
            vc = jnp.where(validf[:, :, None] > 0.0, vc, 0.0)
            acc = acc * corr + jnp.sum(e[:, :, None] * vc, axis=1)
            m = m_new

        if n_chunks == 1:
            out_ref[0] = (acc / den).astype(out_dtype)
        else:
            @pl.when(j < n_chunks - 1)
            def _carry():
                m_s[:] = m
                den_s[:] = den
                acc_s[:] = acc

            @pl.when(j == n_chunks - 1)
            def _emit():
                out_ref[0] = (acc / den).astype(out_dtype)

    return kernel


def _attention_call(
    *, q, k_cache, v_cache, length, layer, interpret, quant,
    deferred, k_scale=None, v_scale=None,
    k_new=None, ks_new=None, v_new=None, vs_new=None,
):
    stacked = layer is not None
    b, h, d = q.shape
    s = k_cache.shape[-2]
    sc = _pick_chunk(h, s, jnp.dtype(k_cache.dtype).itemsize)
    n_chunks = pl.cdiv(s, sc)
    scale = 1.0 / math.sqrt(d)

    in_specs = [_row_spec(h, d, stacked)]
    inputs = [q]
    if deferred:
        in_specs.append(_row_spec(h, d, stacked))
        inputs.append(k_new.astype(q.dtype) if not quant else k_new)
        if quant:
            in_specs.append(_srow_spec(h, stacked))
            inputs.append(ks_new[..., None])
        in_specs.append(_row_spec(h, d, stacked))
        inputs.append(v_new.astype(q.dtype) if not quant else v_new)
        if quant:
            in_specs.append(_srow_spec(h, stacked))
            inputs.append(vs_new[..., None])
    in_specs.append(_cache_spec(h, d, stacked, sc))
    inputs.append(k_cache)
    if quant:
        in_specs.append(_plane_spec(h, stacked, sc))
        inputs.append(k_scale)
    in_specs.append(_cache_spec(h, d, stacked, sc))
    inputs.append(v_cache)
    if quant:
        in_specs.append(_plane_spec(h, stacked, sc))
        inputs.append(v_scale)

    kernel = _build_kernel(
        stacked=stacked, quant=quant, deferred=deferred,
        h=h, d=d, n_chunks=n_chunks, sc=sc, scale=scale, out_dtype=q.dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=_row_spec(h, d, stacked),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),   # running max
            pltpu.VMEM((h, 1), jnp.float32),   # running denominator
            pltpu.VMEM((h, d), jnp.float32),   # running V accumulator
        ],
    )
    scalars = [_lengths_for(q, length)]
    if stacked:
        scalars.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(*scalars, *inputs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_fused(q, k_cache, v_cache, length, *,
                           interpret=False, layer=None):
    """Fused decode attention. q: (B, H, D); caches: (B, H, S, D) —
    stacked (L, B, H, S, D) when ``layer`` is given; length: scalar or (B,)
    valid rows. Returns (B, H, D) in q.dtype."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=False, deferred=False,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_quant_fused(q, k_cache, k_scale, v_cache, v_scale,
                                 length, *, interpret=False, layer=None):
    """Fused decode attention over an INT8 cache. k_scale/v_scale:
    (…, H, S) f32 per-(token, head) scales."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=True, deferred=False,
        k_scale=k_scale, v_scale=v_scale,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_deferred_fused(q, k_new, v_new, k_cache, v_cache,
                                    length, *, interpret=False, layer=None):
    """Deferred-append decode attention: attends over ``length`` OLD cache
    rows plus an explicit self-term for the (un-appended) current token —
    mathematically identical to append-then-attend over length+1 rows."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=False, deferred=True,
        k_new=k_new, v_new=v_new,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_quant_deferred_fused(
    q, k_new, ks_new, v_new, vs_new, k_cache, k_scale, v_cache, v_scale,
    length, *, interpret=False, layer=None,
):
    """Deferred-append decode attention over an INT8 cache. k_new/v_new are
    the already-quantized (B, H, D) int8 rows with (B, H) scales — the same
    values the cache append stores, so the math is bit-identical to
    append-then-attend."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=True, deferred=True,
        k_scale=k_scale, v_scale=v_scale,
        k_new=k_new, ks_new=ks_new, v_new=v_new, vs_new=vs_new,
    )

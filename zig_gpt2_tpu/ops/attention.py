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

# Inner compute chunk cap: the in-kernel loop slices the resident block in
# at-most-128-row steps, shrunk further (via _inner_rows) so the f32
# temporaries (lane-padded to 128 like the blocks) stay ~2 MB each.
_INNER = 128
# VMEM budget for the K+V blocks of one grid step (bytes; double-buffered
# pairs must fit the 16 MB scoped budget together with the ~6 MB of f32
# inner-loop temporaries).
_BLOCK_BUDGET = 8 * 1024 * 1024
# Batch-fold factors _pick_block may choose. Pinned to (1,) — folding
# measured a net loss both ways (see _pick_block docstring); tests
# monkeypatch this to exercise the bc > 1 machinery in interpret mode.
_FOLD_CANDIDATES = (1,)


def _inner_rows(bc, h) -> int:
    """Rows per inner compute step: caps each (h, rows, 128) f32 temporary
    at ~1.6 MB (= the validated 25-head x 128-row config; there are ~6-7
    live temporaries per iteration, and 2 MB/temp measured a 444 KB scoped
    OOM at merged h=50). Multiple of 8 sublanes."""
    cap = (25 * 128 * 128 * 4) // (bc * h * 128 * 4)
    return max(8, min(_INNER, cap // 8 * 8))


def _pick_block(b, h, s, itemsize, quant):
    """(batch-fold bc, S-chunk sc) minimizing the grid size. Grid cells
    carry a large fixed cost (DMA issue for up to 9 operands + prologue;
    measured ~8 us/cell vs <1 us of VPU compute at 1.5B, and 3 S-chunks vs
    1 was a 3x slowdown at B=16 ctx 640), so fold batch elements into one
    cell when the VMEM budget allows, preferring configs that keep the
    whole cache in a single S-chunk (INT8 cache to ctx ~2000 at bc=1,
    bf16 124M to ctx ~1000).

    Folding is currently PINNED OFF (bc = 1) — both attempts measured a
    net loss (see BENCHMARKS.md "Negative result — batch-folding"): a 4-D
    (bc, H, …) kernel lowered ~4% slower, and merging (…, B, H) ->
    (…, B/bc, bc*H) outside the kernel bitcasts the 5-D caches but
    physically retiles the 3-D f32 scale planes (H=25 pads to 32 sublanes
    per batch slice vs 50 -> 56 merged), so XLA copied both full stacked
    plane arrays EVERY layer (40% regression at 1.5B INT8-KV B=16); the
    bf16 variant additionally hung the Mosaic compile. The machinery is
    kept (and interpret-tested) for a future pre-merged plane layout."""
    del quant
    s_pad = -(-s // _INNER) * _INNER
    best = None  # (cells, n_chunks, -bc) lexicographic
    for bc in _FOLD_CANDIDATES:
        if b % bc:
            continue
        per_row = bc * h * 128 * itemsize * 2 * 2  # K+V, double-buffered
        sc = (_BLOCK_BUDGET // per_row) // _INNER * _INNER
        if sc <= 0:
            continue
        sc = min(sc, s_pad)
        n_chunks = -(-s_pad // sc)
        cand = ((b // bc) * n_chunks, n_chunks, -bc, bc, sc)
        if best is None or cand[:3] < best[:3]:
            best = cand
    if best is None:  # degenerate huge-H fallback: minimal blocks
        return 1, _INNER
    return best[3], best[4]


def _lengths_for(q: jax.Array, length) -> jax.Array:
    length = jnp.asarray(length, jnp.int32)
    if length.ndim == 0:
        length = jnp.broadcast_to(length, (q.shape[0],))
    return length


def _row_spec(h, d, stacked):
    """Per-cell (1, H, D) rows (q / k_new / v_new / out), chunk-invariant.
    H here is bc*n_heads when batch elements are folded (see
    _attention_call): grid index i covers the bc sequences whose head
    stacks were merged into one leading dim by a free XLA reshape."""
    if stacked:
        return pl.BlockSpec((1, h, d), lambda i, j, ln, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, d), lambda i, j, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _srow_spec(h, stacked):
    """Per-cell (1, H, 1) scale rows (deferred INT8 variants)."""
    if stacked:
        return pl.BlockSpec((1, h, 1), lambda i, j, ln, idx: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, 1), lambda i, j, ln: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _cache_spec(h, d, stacked, sc):
    """One (1, H, sc, D) cache block per grid step."""
    if stacked:
        return pl.BlockSpec((1, 1, h, sc, d),
                            lambda i, j, ln, idx: (idx[0], i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, sc, d), lambda i, j, ln: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)


def _plane_spec(h, stacked, sc):
    """One (1, H, sc) scale-plane block per grid step (raw (…, H, S))."""
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


def _build_kernel(*, stacked, quant, deferred, bc, h, d, n_chunks, sc,
                  scale, out_dtype):
    """One flash-decode kernel body covering all four variants.

    ``h`` is the MERGED leading dim bc * n_heads: when bc > 1 batch
    elements are folded into the head axis OUTSIDE the kernel (a free XLA
    reshape of default-layout (…, B, H, …) arrays — see _attention_call),
    so bc sequences ride through the identical 3-D VPU code path as one
    taller head stack. In-kernel alternatives measured/failed: a 4-D
    (bc, H, …) formulation was 26% slower end-to-end (worse Mosaic
    lowering); an in-kernel leading-dim reshape doesn't lower at all
    ("unsupported shape cast" — it would merge across a 25-sublane
    boundary). Only the valid-length mask knows about the fold: rows
    belong to bc different sequences with different lengths.
    """
    hg = h // bc  # heads per sequence (mask group size)
    inner = _inner_rows(1, h)

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

        def valid_mask(c0, ln):
            """(H, ln) valid-row mask; row r belongs to sequence r // hg.
            Built with elementwise selects on a row-id iota — Mosaic can't
            shape-cast a (bc,) scalar vector to (bc, 1, 1) for
            broadcasting, nor concat across a non-8-aligned sublane
            boundary."""
            ids = j * sc + c0 + jax.lax.broadcasted_iota(
                jnp.int32, (h, ln), 1)
            if bc == 1:
                return ids < len_ref[i]
            rowid = jax.lax.broadcasted_iota(jnp.int32, (h, ln), 0) // hg
            n = jnp.full((h, ln), len_ref[i * bc], jnp.int32)
            for t in range(1, bc):
                n = jnp.where(rowid == t, len_ref[i * bc + t], n)
            return ids < n

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

        # Inner loop over the resident block in `inner`-row steps: bounds
        # the f32 temporaries while the outer grid keeps DMA blocks big.
        for c0 in range(0, sc, inner):
            ln = min(inner, sc - c0)
            kc = _inner_slice(k_ref, stacked, c0, ln).astype(jnp.float32)
            scores = jnp.sum(kc * qf[:, None, :], axis=-1) * scale
            if quant:
                scores = scores * _inner_slice(
                    ks_ref, stacked, c0, ln, plane=True
                ).astype(jnp.float32)
            valid = valid_mask(c0, ln)
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
    bc, sc = _pick_block(b, h, s, jnp.dtype(k_cache.dtype).itemsize, quant)
    n_chunks = pl.cdiv(-(-s // _INNER) * _INNER, sc)
    scale = 1.0 / math.sqrt(d)
    # Fold bc batch elements into the head axis: (…, B, H, …) ->
    # (…, B/bc, bc*H, …). Free on default layouts (a row-major relabeling
    # of two adjacent leading dims) and keeps the kernel's proven 3-D
    # shapes; the kernel can't do this merge itself (Mosaic rejects
    # reshapes across a non-8-aligned sublane boundary).
    bg, hm = b // bc, bc * h

    def fold_rows(a):  # (B, H, D|1)
        return a if bc == 1 else a.reshape(bg, hm, *a.shape[2:])

    def fold_cache(a):  # (B, H, S[, D]) or stacked (L, B, H, S[, D])
        if bc == 1:
            return a
        if stacked:
            return a.reshape(a.shape[0], bg, hm, *a.shape[3:])
        return a.reshape(bg, hm, *a.shape[2:])

    in_specs = [_row_spec(hm, d, stacked)]
    inputs = [fold_rows(q)]
    if deferred:
        in_specs.append(_row_spec(hm, d, stacked))
        inputs.append(fold_rows(k_new.astype(q.dtype) if not quant else k_new))
        if quant:
            in_specs.append(_srow_spec(hm, stacked))
            inputs.append(fold_rows(ks_new[..., None]))
        in_specs.append(_row_spec(hm, d, stacked))
        inputs.append(fold_rows(v_new.astype(q.dtype) if not quant else v_new))
        if quant:
            in_specs.append(_srow_spec(hm, stacked))
            inputs.append(fold_rows(vs_new[..., None]))
    in_specs.append(_cache_spec(hm, d, stacked, sc))
    inputs.append(fold_cache(k_cache))
    if quant:
        in_specs.append(_plane_spec(hm, stacked, sc))
        inputs.append(fold_cache(k_scale))
    in_specs.append(_cache_spec(hm, d, stacked, sc))
    inputs.append(fold_cache(v_cache))
    if quant:
        in_specs.append(_plane_spec(hm, stacked, sc))
        inputs.append(fold_cache(v_scale))

    kernel = _build_kernel(
        stacked=stacked, quant=quant, deferred=deferred, bc=bc,
        h=hm, d=d, n_chunks=n_chunks, sc=sc, scale=scale, out_dtype=q.dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(bg, n_chunks),
        in_specs=in_specs,
        out_specs=_row_spec(hm, d, stacked),
        scratch_shapes=[
            pltpu.VMEM((hm, 1), jnp.float32),  # running max
            pltpu.VMEM((hm, 1), jnp.float32),  # running denominator
            pltpu.VMEM((hm, d), jnp.float32),  # running V accumulator
        ],
    )
    scalars = [_lengths_for(q, length)]
    if stacked:
        scalars.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bg, hm, d), q.dtype),
        interpret=interpret,
    )(*scalars, *inputs)
    return out if bc == 1 else out.reshape(b, h, d)


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

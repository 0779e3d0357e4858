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

import os

from zig_gpt2_tpu.ops.layers import MASK_VALUE

# Route the V-accumulate's S-reduction through the MXU (segment-matrix
# dot) instead of strided VPU sublane passes. DEFAULT OFF — a measured
# negative result: the isolated kernel gets +6% (166.8 -> 156.4 us/call,
# 1.5B B=16 shapes), but END-TO-END it LOSES 2.3% (1181 vs 1209 tok/s,
# back-to-back same-session): in the full decode step the MXU is already
# busy streaming qmm weights, so the seg-dot serializes against it,
# while the VPU sublane passes it replaces were overlapping free.
# ZG2_ATTN_MXU=1 re-enables for isolated-kernel experiments.
_MXU_REDUCE = os.environ.get("ZG2_ATTN_MXU", "0") == "1"

# Inner compute chunk cap: the in-kernel loop slices the resident block in
# at-most-128-row steps, shrunk further (via _inner_rows) so the f32
# temporaries (lane-padded to 128 like the blocks) stay ~2 MB each.
_INNER = 128
# VMEM budget for the K+V blocks of one grid step (bytes; double-buffered
# pairs must fit the 16 MB scoped budget together with the ~6 MB of f32
# inner-loop temporaries).
_BLOCK_BUDGET = 8 * 1024 * 1024
# Batch-fold factors _pick_block may choose, best-first. The fold keeps a
# separate bc BLOCK axis and loops sub-batches inside the kernel (see
# _build_kernel) — round 1's sublane-merging folds both lost (40%
# plane-retile regression / no lowering; BENCHMARKS.md "Negative result —
# batch-folding"). Default cap is the hardware-proven bc=2 (the 1205 tok/s
# config): Mosaic keeps each sub-batch's f32 temporaries live across the
# unrolled loop, so larger folds risk scoped-VMEM OOM on shapes the TPU
# tests didn't cover — raise via ZG2_ATTN_FOLD_MAX after measuring.
def _fold_candidates() -> tuple:
    """Read at dispatch time (like every other ZG2_* knob) so a test or
    A/B harness can raise the cap after import."""
    fold_max = int(os.environ.get("ZG2_ATTN_FOLD_MAX", "2"))
    return tuple(c for c in (8, 4, 2, 1) if c <= fold_max)


def _inner_rows(bc, h) -> int:
    """Rows per inner compute step: caps each (h, rows, 128) f32 temporary
    at ~1.6 MB (= the validated 25-head x 128-row config; there are ~6-7
    live temporaries per iteration, and 2 MB/temp measured a 444 KB scoped
    OOM at merged h=50). Multiple of 8 sublanes."""
    cap = (25 * 128 * 128 * 4) // (bc * h * 128 * 4)
    return max(8, min(_INNER, cap // 8 * 8))


def _pick_block(b, h, s, itemsize, quant, foldable=False, packed=False):
    """(batch-fold bc, S-chunk sc, n_chunks) minimizing the grid size. Grid cells
    carry a large fixed cost (DMA issue for up to 9 operands + prologue;
    measured ~8 us/cell vs <1 us of VPU compute at 1.5B, and 3 S-chunks vs
    1 was a 3x slowdown at B=16 ctx 640), so fold batch elements into one
    cell when the VMEM budget allows, preferring configs that keep the
    whole cache in a single S-chunk (INT8 cache to ctx ~2000 at bc=1,
    bf16 124M to ctx ~1000).

    ``foldable``: allow bc > 1 (the in-cell sub-batch loop,
    _build_kernel)."""
    # The K/V cache blocks (…, sc, D) only need sc 8-aligned, so a single
    # chunk can be exactly ceil8(S) — chunking to _INNER multiples padded
    # 192 -> 256 and burned 33% of the kernel's (compute-bound) VPU work
    # on masked rows. BUT the quant scale-plane blocks (…, H, sc) put sc
    # on the LANE dim, where Mosaic requires a 128-multiple OR exactly the
    # full array dim — so for the INT8 cache, exact-S only applies when
    # S is itself 8-aligned (sc == S); otherwise fall back to 128-padded
    # chunks (e.g. the batcher's S = max_seq + decode_chunk - 1 = 207).
    s_pad = -(-s // 8) * 8
    if quant and s_pad != s:
        s_pad = -(-s // _INNER) * _INNER
    best = None  # (cells, n_chunks, -bc) lexicographic
    for bc in _fold_candidates() if foldable else (1,):
        if b % bc:
            continue
        per_row = bc * h * 128 * itemsize * 2 * 2  # K+V, double-buffered
        budget_rows = _BLOCK_BUDGET // per_row
        single_ok = budget_rows >= s_pad
        fence = int(os.environ.get("ZG2_PACKED_VMEM_FENCE", str(13 * 768)))
        if packed and quant and bc * h * s_pad > fence:
            # The packed quant kernel's statically-unrolled inner loop
            # scoped-VMEM OOMs before the block budget does: measured on
            # v5e (tools/ab/vmem_sweep.py, hp=13, round-4 HALF-AXIS scale
            # layout) single-chunk compiles through sc=768 (13.9M) and
            # dies at sc=896 (18.42M > 16M) — fence hp*sc <= 13*768.
            # Round-5 per-PAIR scales halve the plane reads and their f32
            # temporaries, so this fence is likely loose now; the env
            # override exists for vmem_sweep to probe the true boundary —
            # re-pin the default from the round-5 sweep.
            single_ok = False
        if single_ok:
            sc, n_chunks = s_pad, 1
        else:
            # Multi-chunk: keep _INNER-granular chunks (equal blocks).
            # bc > 1 here OOMs scoped VMEM: Mosaic keeps each sub-batch's
            # f32 temporaries live across the unrolled t-loop, and multi-
            # chunk's bigger per-cell blocks leave no headroom (measured
            # 17.2M > 16M at 1.5B ctx 1152, bc=4·sc=128 AND bc=2·sc=256);
            # single-chunk bc=2 at sc<=320 is proven on hardware.
            # Those OOM measurements predate the head-pair-packed layout,
            # which halves the live temporaries (h -> h/2 at 128 lanes):
            # measured 2026-08-18 on v5e, packed 1.5B B=16 ctx 1152
            # INT4+INT8KV runs multi-chunk bc>1 clean at +16.5% (283.8 vs
            # 243.5 tok/s) — so packed defaults ON here. Unpacked keeps
            # the proven-OOM default OFF. ZG2_ATTN_MC_FOLD=1/0 forces.
            mc_fold = os.environ.get("ZG2_ATTN_MC_FOLD",
                                     "1" if packed else "0")
            if bc > 1 and mc_fold != "1":
                continue
            # Half budget for multi-chunk blocks: the scratch-carry path
            # keeps ~10.7 MB of inner-loop state live (measured: 17.2 MB
            # scoped OOM at sc=512 regardless of bc·sc split), so the
            # full 8 MB block budget only fits when single-chunk.
            sc = (budget_rows // 2) // _INNER * _INNER
            if sc <= 0:
                continue
            n_chunks = -(-s_pad // sc)
        cand = ((b // bc) * n_chunks, n_chunks, -bc, bc, sc)
        if best is None or cand[:3] < best[:3]:
            best = cand
    if best is None:  # degenerate huge-H fallback: minimal blocks
        return 1, _INNER, -(-s_pad // _INNER)
    return best[3], best[4], best[1]


# --- head-pair packing layout helpers (the D=64 half-lane fix) -------------
# Packed layout: adjacent memory heads (2i, 2i+1) share one 2D=128-lane row.
# INT8 scales are PER-PAIR (one f32 scale per packed row per token, shared
# by both heads — quantize_kv applied to the packed (…, Hp, 2D) rows), so
# the scale planes are (…, Hp, S): HALF the plane bytes of the per-head
# layout and no half axis in the kernel. (Round 4 stored per-head scales
# half-grouped as (…, 2, Hp, S); the doubled plane traffic + unrolled
# temporaries made the packed quant kernel LOSE 0.945x and scoped-VMEM OOM
# above hp*sc = 13*768 — VERDICT r04 weak #1. Per-pair deletes both.)

def pack_heads_rows(x: jax.Array) -> jax.Array:
    """(…, H, D) -> (…, H/2, 2D). FREE: adjacent heads are contiguous."""
    *lead, h, d = x.shape
    return x.reshape(*lead, h // 2, 2 * d)


def unpack_heads_rows(x: jax.Array) -> jax.Array:
    """(…, Hp, 2D) -> (…, 2Hp, D). FREE (inverse of pack_heads_rows)."""
    *lead, hp, d2 = x.shape
    return x.reshape(*lead, hp * 2, d2 // 2)


def pack_heads_seq(x: jax.Array) -> jax.Array:
    """(…, H, T, D) -> (…, H/2, T, 2D) (prefill K/V; a transpose, one-time)."""
    *lead, h, t, d = x.shape
    x = x.reshape(*lead, h // 2, 2, t, d)
    return jnp.swapaxes(x, -3, -2).reshape(*lead, h // 2, t, 2 * d)


def unpack_heads_seq(x: jax.Array) -> jax.Array:
    """(…, Hp, S, 2D) -> (…, 2Hp, S, D) (inverse of pack_heads_seq)."""
    *lead, hp, s, d2 = x.shape
    d = d2 // 2
    x = x.reshape(*lead, hp, s, 2, d)
    return jnp.swapaxes(x, -3, -2).reshape(*lead, hp * 2, s, d)


def unpack_pair_scales_seq(s: jax.Array) -> jax.Array:
    """(…, Hp, S) per-pair scale plane -> (…, 2Hp, S) per-head view: both
    heads of a pair share the scale (that IS the quantization semantics).
    XLA-land only (jnp.repeat is a scatter in Mosaic)."""
    return jnp.repeat(s, 2, axis=-2)


def unpack_pair_scales_rows(s: jax.Array) -> jax.Array:
    """(…, Hp) per-pair scale rows -> (…, 2Hp) per-head view."""
    return jnp.repeat(s, 2, axis=-1)


def _lengths_for(q: jax.Array, length) -> jax.Array:
    length = jnp.asarray(length, jnp.int32)
    if length.ndim == 0:
        length = jnp.broadcast_to(length, (q.shape[0],))
    return length


# Index maps take (*grid indices, *scalar-prefetch refs); the prefetch
# count varies per variant — lengths, optional ring starts, optional layer
# index — so the maps use varargs with the LAYER ref pinned as the LAST
# prefetch arg (p[-1]) for the stacked blocks.

def _row_spec(h, d, stacked, bc=1):
    """Per-cell (1[, bc], H, D) rows (q / k_new / v_new / out),
    chunk-invariant. With bc > 1 the arrays carry an explicit bc axis
    (batch split (B,)->(B/bc, bc), a free leading-dim reshape) and the
    kernel loops the bc sub-batches inside one grid cell — amortizing the
    per-cell fixed cost (DMA issue + prologue, ~8 us measured at 1.5B)
    without any sublane merging (Mosaic only constrains the LAST TWO block
    dims, so the bc axis is free; merging (B, H) -> bc*H instead needs an
    8-aligned H, which 25 heads never is)."""
    if bc > 1:
        return pl.BlockSpec((1, bc, h, d), lambda i, j, *p: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, d), lambda i, j, *p: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _srow_spec(h, stacked, bc=1):
    """Per-cell (1[, bc], H, 1) scale rows (deferred INT8 variants)."""
    if bc > 1:
        return pl.BlockSpec((1, bc, h, 1), lambda i, j, *p: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, 1), lambda i, j, *p: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _cache_spec(h, d, stacked, sc, bc=1):
    """One (1[, 1][, bc], H, sc, D) cache block per grid step."""
    if bc > 1:
        if stacked:
            return pl.BlockSpec((1, 1, bc, h, sc, d),
                                lambda i, j, *p: (p[-1][0], i, 0, 0, j, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, bc, h, sc, d),
                            lambda i, j, *p: (i, 0, 0, j, 0),
                            memory_space=pltpu.VMEM)
    if stacked:
        return pl.BlockSpec((1, 1, h, sc, d),
                            lambda i, j, *p: (p[-1][0], i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, sc, d), lambda i, j, *p: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)


def _plane_spec(h, stacked, sc, bc=1):
    """One (1[, 1][, bc], H, sc) scale-plane block per grid step (planes
    stored raw as (…, H, S); with bc > 1 the block's last two dims stay
    (H, sc) — H equal to the full dim satisfies Mosaic regardless of
    8-alignment)."""
    if bc > 1:
        if stacked:
            return pl.BlockSpec((1, 1, bc, h, sc),
                                lambda i, j, *p: (p[-1][0], i, 0, 0, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, bc, h, sc), lambda i, j, *p: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    if stacked:
        return pl.BlockSpec((1, 1, h, sc),
                            lambda i, j, *p: (p[-1][0], i, 0, j),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, h, sc), lambda i, j, *p: (i, 0, j),
                        memory_space=pltpu.VMEM)


def _build_kernel_packed(*, stacked, quant, deferred, bc, hp, d, n_chunks,
                         sc, scale, out_dtype, padded=True, ring=0):
    """Head-pair-PACKED flash-decode kernel body.

    The D=64 half-lane fix (BENCHMARKS.md perf model; round-2 verdict item
    1): every f32 temporary of the unpacked kernel is (H, ln, D=64) padded
    to 128 lanes — half of every VPU register row is dead. Here the cache
    is stored (…, Hp=H/2, S, 2D=128): lanes [0:D] of packed row hp hold
    head 2·hp, lanes [D:2D] hold head 2·hp+1 (a FREE reshape of the
    (…, H, D) row — adjacent heads are contiguous), so the 3-D passes
    (convert, q·K multiply, V weighting, the strided S-reduction) run at
    full lane occupancy on half the physical elements.

    The per-head 2-D softmax state cannot stay packed (the score reduction
    collapses D, leaving (…, ln) per head), so the kernel runs TWO disjoint
    online-softmax recurrences — "lo" for even memory heads (lane half
    [0:D]) and "hi" for odd (lane half [D:2D]) — over (Hp, ln) arrays;
    total 2-D work is unchanged (2·Hp == H rows). The V accumulator stays
    packed (Hp, 2D): the probability rows are broadcast into their lane
    half (two (Hp, ln, D) broadcasts + one lane concat — the one extra
    pass packing costs) and corrections/denominators apply per half the
    same way. Quant scales are PER-PAIR — planes (…, Hp, S), rows (…, Hp)
    — so one plane read feeds BOTH recurrences (half the plane traffic of
    the round-4 per-head half-axis layout, and the same _plane_spec /
    _srow_spec block shapes as the unpacked kernel with h = Hp).
    """
    inner = _inner_rows(1, hp)  # temporaries are (Hp, rows, 128): half the
    # rows of the unpacked kernel's (H, rows, 128) budget, so inner may
    # legitimately come out 2x larger.
    dyn_inner = False
    # Ring mode: validity is an INTERVAL mod ring, not a prefix — the
    # dynamic-trip-count skip (which assumes prefix validity) is off.
    if not quant and not ring:
        for cand in range(min(inner, sc), 31, -8):
            if sc % cand == 0:
                inner, dyn_inner = cand, True
                break

    def kernel(*args):
        it = iter(args)
        len_ref = next(it)
        start_ref = next(it) if ring else None
        if stacked:
            next(it)  # layer idx: consumed by the index maps
        refs = list(it)
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

        def row(ref, t):
            return ref[0, t] if bc > 1 else ref[0]

        def cache_slice(ref, t, c0, ln):
            idx = pl.ds(c0, ln)
            if stacked:
                return (ref[0, 0, t, :, idx, :] if bc > 1
                        else ref[0, 0, :, idx, :])
            return (ref[0, t, :, idx, :] if bc > 1
                    else ref[0, :, idx, :])

        def plane_slice(ref, t, c0, ln):
            # per-pair plane block (…, Hp, sc) -> (Hp, ln)
            idx = pl.ds(c0, ln)
            if stacked:
                return (ref[0, 0, t, :, idx] if bc > 1
                        else ref[0, 0, :, idx])
            return (ref[0, t, :, idx] if bc > 1
                    else ref[0, :, idx])

        def scratch_read(sref, t, half):
            return sref[t, half] if bc > 1 else sref[half]

        def scratch_write(sref, t, half, val):
            if bc > 1:
                sref[t, half] = val
            else:
                sref[half] = val

        def lane_pack(lo, hi, rows):
            """Broadcast (Hp, ln) lo/hi rows into their D-lane halves and
            concat to (Hp, ln, 2D) (or (Hp, 2D) for 2-D lo/hi)."""
            return jnp.concatenate(
                [jnp.broadcast_to(lo[..., None], (*lo.shape, d)),
                 jnp.broadcast_to(hi[..., None], (*hi.shape, d))],
                axis=-1,
            ) if rows else jnp.concatenate(
                [jnp.broadcast_to(lo, (lo.shape[0], d)),
                 jnp.broadcast_to(hi, (hi.shape[0], d))],
                axis=-1,
            )

        for t in range(bc):
            qf = row(q_ref, t).astype(jnp.float32)  # (Hp, 2D)
            lane = i * bc + t if bc > 1 else i
            seq_len = len_ref[lane]
            ring_start = start_ref[lane] if ring else None

            if deferred:
                knf = row(kn_ref, t).astype(jnp.float32)
                p = knf * qf  # (Hp, 2D)
                init_m_lo = jnp.sum(p[:, :d], axis=-1, keepdims=True) * scale
                init_m_hi = jnp.sum(p[:, d:], axis=-1, keepdims=True) * scale
                if quant:  # one (Hp, 1) PAIR scale feeds both halves
                    ksn = row(ksn_ref, t).astype(jnp.float32)
                    init_m_lo = init_m_lo * ksn
                    init_m_hi = init_m_hi * ksn
                init_den = jnp.ones((hp, 1), jnp.float32)
                init_acc = row(vn_ref, t).astype(jnp.float32)  # (Hp, 2D)
                if quant:  # (Hp, 1) broadcasts over the packed 2D lanes
                    init_acc = init_acc * row(vsn_ref, t).astype(jnp.float32)
            else:
                init_m_lo = jnp.full((hp, 1), MASK_VALUE, jnp.float32)
                init_m_hi = init_m_lo
                init_den = jnp.zeros((hp, 1), jnp.float32)
                init_acc = jnp.zeros((hp, 2 * d), jnp.float32)
            if n_chunks == 1:
                m_lo, m_hi = init_m_lo, init_m_hi
                den_lo, den_hi = init_den, init_den
                acc = init_acc
            else:
                first = j == 0
                m_lo = jnp.where(first, init_m_lo, scratch_read(m_s, t, 0))
                m_hi = jnp.where(first, init_m_hi, scratch_read(m_s, t, 1))
                den_lo = jnp.where(first, init_den, scratch_read(den_s, t, 0))
                den_hi = jnp.where(first, init_den, scratch_read(den_s, t, 1))
                acc = jnp.where(first, init_acc,
                                acc_s[t] if bc > 1 else acc_s[:])

            def fold_chunk(c0, ln, m_lo, m_hi, den_lo, den_hi, acc):
                kc = cache_slice(k_ref, t, c0, ln).astype(jnp.float32)
                prod = kc * qf[:, None, :]  # (Hp, ln, 2D)
                s_lo = jnp.sum(prod[..., :d], axis=-1) * scale  # (Hp, ln)
                s_hi = jnp.sum(prod[..., d:], axis=-1) * scale
                if quant:  # ONE per-pair (Hp, ln) plane scales both halves
                    ksp = plane_slice(ks_ref, t, c0, ln).astype(jnp.float32)
                    s_lo = s_lo * ksp
                    s_hi = s_hi * ksp
                ids = j * sc + c0 + jax.lax.broadcasted_iota(
                    jnp.int32, (hp, ln), 1)
                if ring:  # interval [start, start+len) mod ring
                    rel = ids - ring_start
                    rel = rel + jnp.where(rel < 0, ring, 0)
                    valid = rel < seq_len
                    if padded:  # block-padding rows past S never alias in
                        valid = valid & (ids < ring)
                else:
                    valid = ids < seq_len
                s_lo = jnp.where(valid, s_lo, MASK_VALUE)
                s_hi = jnp.where(valid, s_hi, MASK_VALUE)
                m_lo_new = jnp.maximum(m_lo, jnp.max(s_lo, axis=-1, keepdims=True))
                m_hi_new = jnp.maximum(m_hi, jnp.max(s_hi, axis=-1, keepdims=True))
                corr_lo = jnp.exp(m_lo - m_lo_new)
                corr_hi = jnp.exp(m_hi - m_hi_new)
                e_lo = jnp.where(valid, jnp.exp(s_lo - m_lo_new), 0.0)
                e_hi = jnp.where(valid, jnp.exp(s_hi - m_hi_new), 0.0)
                den_lo = den_lo * corr_lo + jnp.sum(e_lo, axis=-1, keepdims=True)
                den_hi = den_hi * corr_hi + jnp.sum(e_hi, axis=-1, keepdims=True)
                if quant:  # V scales weight the sum, never the denominator
                    vsp = plane_slice(vs_ref, t, c0, ln).astype(jnp.float32)
                    e_lo = e_lo * vsp
                    e_hi = e_hi * vsp
                    if padded:
                        # Rows past S are uninitialized block padding and
                        # 0 * NaN = NaN — re-mask after the scale multiply
                        # (vanishes statically when chunks cover exactly S).
                        e_lo = jnp.where(valid, e_lo, 0.0)
                        e_hi = jnp.where(valid, e_hi, 0.0)
                vc = cache_slice(v_ref, t, c0, ln).astype(jnp.float32)
                if padded:
                    validf = valid.astype(jnp.float32)
                    vc = jnp.where(validf[:, :, None] > 0.0, vc, 0.0)
                ev = lane_pack(e_lo, e_hi, rows=True) * vc  # (Hp, ln, 2D)
                corr_p = lane_pack(corr_lo, corr_hi, rows=False)  # (Hp, 2D)
                acc = acc * corr_p + jnp.sum(ev, axis=1)
                return m_lo_new, m_hi_new, den_lo, den_hi, acc

            if dyn_inner:
                valid_rows = jnp.clip(seq_len - j * sc, 0, sc)
                n_dyn = (valid_rows + inner - 1) // inner

                def body_fn(it_, carry):
                    return fold_chunk(it_ * inner, inner, *carry)

                m_lo, m_hi, den_lo, den_hi, acc = jax.lax.fori_loop(
                    0, n_dyn, body_fn, (m_lo, m_hi, den_lo, den_hi, acc))
            else:
                for c0 in range(0, sc, inner):
                    m_lo, m_hi, den_lo, den_hi, acc = fold_chunk(
                        c0, min(inner, sc - c0),
                        m_lo, m_hi, den_lo, den_hi, acc)

            def emit(t=t, acc=acc, den_lo=den_lo, den_hi=den_hi):
                den_p = lane_pack(den_lo, den_hi, rows=False)
                if bc > 1:
                    out_ref[0, t] = (acc / den_p).astype(out_dtype)
                else:
                    out_ref[0] = (acc / den_p).astype(out_dtype)

            if n_chunks == 1:
                emit()
            else:
                @pl.when(j < n_chunks - 1)
                def _carry(t=t, m_lo=m_lo, m_hi=m_hi, den_lo=den_lo,
                           den_hi=den_hi, acc=acc):
                    scratch_write(m_s, t, 0, m_lo)
                    scratch_write(m_s, t, 1, m_hi)
                    scratch_write(den_s, t, 0, den_lo)
                    scratch_write(den_s, t, 1, den_hi)
                    if bc > 1:
                        acc_s[t] = acc
                    else:
                        acc_s[:] = acc

                pl.when(j == n_chunks - 1)(emit)

    return kernel


def _build_kernel(*, stacked, quant, deferred, bc, h, d, n_chunks, sc,
                  scale, out_dtype, padded=True, ring=0):
    """One flash-decode kernel body covering all variants.

    ``h`` is the per-sequence head count. With bc > 1 the kernel serially
    processes bc sub-batches per grid cell (a static python loop) — every
    sub-batch runs the identical proven 3-D math on its own (h, …) slices,
    so there is no sublane merging and no 4-D vector lowering; only the
    per-cell fixed cost (DMA issue for up to 9 operands + prologue) is
    amortized bc-fold. Earlier alternatives measured/failed: vectorizing
    across a 4-D (bc, H, …) block was ~4%% slower (worse Mosaic lowering);
    merging (B, H) -> bc*H outside the kernel retiled the scale planes
    (40%% regression) and an in-kernel merge doesn't lower at all.
    """
    # Deliberately NOT scaled by bc: _pick_block restricts bc > 1 to
    # single-chunk configs (sc ≤ ~320 int8), where inner=128 with bc=2 is
    # the hardware-proven 1205 tok/s configuration; scaling down by bc
    # would change it. (Mosaic keeps each sub-batch's temporaries live
    # across the unrolled t-loop, so bc > 1 with multi-chunk blocks OOMs
    # scoped VMEM — hence the _pick_block restriction.)
    inner = _inner_rows(1, h)
    # Dynamic-trip-count inner loop (compute ∝ live length, not capacity)
    # wants uniform full-size iterations: shrink inner to the largest
    # 8-multiple divisor of sc (e.g. 192 -> 96). QUANT variants can't use
    # it: the scale planes' minor dim is S (lanes), and Mosaic requires
    # dynamic lane-dim offsets to be 128-aligned — measured error; the
    # float cache slices S on the SUBLANE dim (D minor), which is fine.
    # RING variants can't either: validity is an interval mod ring, not a
    # prefix, so no chunk can be skipped by trip count.
    dyn_inner = False
    if not quant and not ring:
        for cand in range(min(inner, sc), 31, -8):
            if sc % cand == 0:
                inner, dyn_inner = cand, True
                break

    def kernel(*args):
        it = iter(args)
        len_ref = next(it)
        start_ref = next(it) if ring else None
        if stacked:
            next(it)  # layer idx: consumed by the index maps
        refs = list(it)
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

        # Sub-batch accessors: index the bc axis with a static t, slice the
        # chunk window straight off the ref (reads only the slice).
        def row(ref, t):
            return ref[0, t] if bc > 1 else ref[0]

        def cache_slice(ref, t, c0, ln):
            idx = pl.ds(c0, ln)  # c0 static (python loop) or traced (fori)
            if stacked:
                return (ref[0, 0, t, :, idx, :] if bc > 1
                        else ref[0, 0, :, idx, :])
            return (ref[0, t, :, idx, :] if bc > 1
                    else ref[0, :, idx, :])

        def plane_slice(ref, t, c0, ln):
            idx = pl.ds(c0, ln)
            if stacked:
                return (ref[0, 0, t, :, idx] if bc > 1
                        else ref[0, 0, :, idx])
            return (ref[0, t, :, idx] if bc > 1
                    else ref[0, :, idx])

        def scratch_read(sref, t):
            return sref[t] if bc > 1 else sref[:]

        def scratch_write(sref, t, val):
            if bc > 1:
                sref[t] = val
            else:
                sref[:] = val

        for t in range(bc):
            qf = row(q_ref, t).astype(jnp.float32)  # (H, D)
            lane = i * bc + t if bc > 1 else i
            seq_len = len_ref[lane]
            ring_start = start_ref[lane] if ring else None

            # Running softmax state is carried as VALUES through the inner
            # loop (scratch read-modify-writes per iteration measured ~2.6x
            # slower); scratch is touched only at grid-step boundaries, and
            # not at all when the whole cache fits one grid step.
            if deferred:
                # Seed the recurrence with the self-term: running max = the
                # self score, denominator = exp(0) = 1, accumulator = the
                # (scaled) new V row.
                init_m = jnp.sum(
                    row(kn_ref, t).astype(jnp.float32) * qf,
                    axis=-1, keepdims=True,
                ) * scale
                if quant:
                    init_m = init_m * row(ksn_ref, t).astype(jnp.float32)
                init_den = jnp.ones((h, 1), jnp.float32)
                init_acc = row(vn_ref, t).astype(jnp.float32)
                if quant:
                    init_acc = init_acc * row(vsn_ref, t).astype(jnp.float32)
            else:
                init_m = jnp.full((h, 1), MASK_VALUE, jnp.float32)
                init_den = jnp.zeros((h, 1), jnp.float32)
                init_acc = jnp.zeros((h, d), jnp.float32)
            if n_chunks == 1:
                m, den, acc = init_m, init_den, init_acc
            else:
                first = j == 0
                m = jnp.where(first, init_m, scratch_read(m_s, t))
                den = jnp.where(first, init_den, scratch_read(den_s, t))
                acc = jnp.where(first, init_acc, scratch_read(acc_s, t))

            # Inner loop over the resident block in `inner`-row steps:
            # bounds the f32 temporaries while the grid keeps DMA blocks
            # big. ``c0`` may be a traced offset (dynamic trip count).
            def fold_chunk(c0, ln, m, den, acc):
                kc = cache_slice(k_ref, t, c0, ln).astype(jnp.float32)
                scores = jnp.sum(kc * qf[:, None, :], axis=-1) * scale
                if quant:
                    scores = scores * plane_slice(
                        ks_ref, t, c0, ln
                    ).astype(jnp.float32)
                ids = j * sc + c0 + jax.lax.broadcasted_iota(
                    jnp.int32, (h, ln), 1)
                if ring:  # interval [start, start+len) mod ring
                    rel = ids - ring_start
                    rel = rel + jnp.where(rel < 0, ring, 0)
                    valid = rel < seq_len
                    if padded:  # block-padding rows past S never alias in
                        valid = valid & (ids < ring)
                else:
                    valid = ids < seq_len
                scores = jnp.where(valid, scores, MASK_VALUE)
                m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
                corr = jnp.exp(m - m_new)
                e = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # (H, ln)
                den = den * corr + jnp.sum(e, axis=-1, keepdims=True)
                if quant:  # V scales weight the sum, never the denominator
                    ev = e * plane_slice(
                        vs_ref, t, c0, ln
                    ).astype(jnp.float32)
                    if padded:
                        # Re-mask after the multiply: rows past S are block
                        # padding — uninitialized, and 0 * NaN = NaN. (Rows
                        # within S but past the valid length hold stale but
                        # FINITE data, so when the chunking covers exactly
                        # ceil8(S) these two full-size re-masks vanish —
                        # they were ~2 of the ~12 VPU passes per chunk.)
                        ev = jnp.where(valid, ev, 0.0)
                    e = ev
                vc = cache_slice(v_ref, t, c0, ln).astype(jnp.float32)
                if padded:
                    # Zero padded V rows too (same NaN concern). Mask
                    # widened to f32 first — Mosaic only supports non-no-op
                    # minor-dim inserts on 32-bit types, not bool.
                    validf = valid.astype(jnp.float32)
                    vc = jnp.where(validf[:, :, None] > 0.0, vc, 0.0)
                ev = e[:, :, None] * vc  # (H, ln, D)
                if _MXU_REDUCE:
                    # Σ_s on the MXU instead of ~7 strided VPU sublane
                    # passes: flatten to (H·ln, D) (legal merge — ln is
                    # 8-aligned) and left-multiply a 0/1 segment matrix;
                    # the output (H, D) lands with H on sublanes and D on
                    # lanes — exactly acc's layout, no transposes. (The
                    # score-side lane reduction can NOT do this: its
                    # output would put S on sublanes and need a
                    # sublane→lane transpose.)
                    flat = ev.reshape(h * ln, d)
                    rowh = jax.lax.broadcasted_iota(
                        jnp.int32, (h, h * ln), 0)
                    srch = jax.lax.broadcasted_iota(
                        jnp.int32, (h, h * ln), 1) // ln
                    seg = (rowh == srch).astype(jnp.float32)
                    acc = acc * corr + jnp.dot(
                        seg, flat, preferred_element_type=jnp.float32)
                else:
                    acc = acc * corr + jnp.sum(ev, axis=1)
                return m_new, den, acc

            if dyn_inner:
                # Dynamic trip count: only iterate chunks that hold valid
                # rows — decode compute becomes ∝ the LIVE length, not the
                # cache capacity (a cell at length 64 of a 192-row block
                # does 1/2 the passes; early serving slots skip almost
                # everything). Requires inner | sc so every iteration is
                # full-size.
                valid_rows = jnp.clip(seq_len - j * sc, 0, sc)
                n_dyn = (valid_rows + inner - 1) // inner

                def body_fn(it, carry):
                    return fold_chunk(it * inner, inner, *carry)

                m, den, acc = jax.lax.fori_loop(
                    0, n_dyn, body_fn, (m, den, acc))
            else:
                for c0 in range(0, sc, inner):
                    m, den, acc = fold_chunk(c0, min(inner, sc - c0),
                                             m, den, acc)

            if n_chunks == 1:
                if bc > 1:
                    out_ref[0, t] = (acc / den).astype(out_dtype)
                else:
                    out_ref[0] = (acc / den).astype(out_dtype)
            else:
                @pl.when(j < n_chunks - 1)
                def _carry(t=t, m=m, den=den, acc=acc):
                    scratch_write(m_s, t, m)
                    scratch_write(den_s, t, den)
                    scratch_write(acc_s, t, acc)

                @pl.when(j == n_chunks - 1)
                def _emit(t=t, acc=acc, den=den):
                    if bc > 1:
                        out_ref[0, t] = (acc / den).astype(out_dtype)
                    else:
                        out_ref[0] = (acc / den).astype(out_dtype)

    return kernel


def _attention_call(
    *, q, k_cache, v_cache, length, layer, interpret, quant,
    deferred, k_scale=None, v_scale=None,
    k_new=None, ks_new=None, v_new=None, vs_new=None, packed=False,
    start=None,
):
    stacked = layer is not None
    ring = k_cache.shape[-2] if start is not None else 0
    if packed:
        # q/k_new/v_new: (B, Hp, 2D) head-pair rows; caches (…, Hp, S, 2D);
        # per-PAIR scale planes (…, Hp, S); ks_new/vs_new (B, Hp).
        b, hp, d2 = q.shape
        h, d = hp, d2 // 2  # `h` = packed row count for block sizing
    else:
        b, h, d = q.shape
    s = k_cache.shape[-2]
    bc, sc, n_chunks = _pick_block(
        b, h, s, jnp.dtype(k_cache.dtype).itemsize, quant, foldable=True,
        packed=packed)
    scale = 1.0 / math.sqrt(d)
    # Fold: split the batch (B,) -> (B/bc, bc) on every operand — a free
    # leading-dim reshape; the kernel loops the bc sub-batches per cell.
    bg = b // bc

    def fold_rows(a):  # (B, H, D|1)
        return a if bc == 1 else a.reshape(bg, bc, *a.shape[1:])

    def fold_cache(a):  # (B, H, S[, D]) or stacked (L, B, H, S[, D])
        if bc == 1:
            return a
        if stacked:
            return a.reshape(a.shape[0], bg, bc, *a.shape[2:])
        return a.reshape(bg, bc, *a.shape[1:])

    dl = 2 * d if packed else d  # lane width of row/cache blocks
    # Per-pair scales give the packed variants the SAME scale-block shapes
    # as the unpacked ones (h = Hp packed rows): planes (…, h, sc), rows
    # (…, h, 1).
    srow_spec = _srow_spec(h, stacked, bc)
    plane_spec = _plane_spec(h, stacked, sc, bc)
    in_specs = [_row_spec(h, dl, stacked, bc)]
    inputs = [fold_rows(q)]
    if deferred:
        in_specs.append(_row_spec(h, dl, stacked, bc))
        inputs.append(fold_rows(k_new.astype(q.dtype) if not quant else k_new))
        if quant:
            in_specs.append(srow_spec)
            inputs.append(fold_rows(ks_new[..., None]))
        in_specs.append(_row_spec(h, dl, stacked, bc))
        inputs.append(fold_rows(v_new.astype(q.dtype) if not quant else v_new))
        if quant:
            in_specs.append(srow_spec)
            inputs.append(fold_rows(vs_new[..., None]))
    in_specs.append(_cache_spec(h, dl, stacked, sc, bc))
    inputs.append(fold_cache(k_cache))
    if quant:
        in_specs.append(plane_spec)
        inputs.append(fold_cache(k_scale))
    in_specs.append(_cache_spec(h, dl, stacked, sc, bc))
    inputs.append(fold_cache(v_cache))
    if quant:
        in_specs.append(plane_spec)
        inputs.append(fold_cache(v_scale))

    if packed:
        kernel = _build_kernel_packed(
            stacked=stacked, quant=quant, deferred=deferred, bc=bc,
            hp=h, d=d, n_chunks=n_chunks, sc=sc, scale=scale,
            out_dtype=q.dtype, padded=n_chunks * sc > s, ring=ring,
        )
    else:
        kernel = _build_kernel(
            stacked=stacked, quant=quant, deferred=deferred, bc=bc,
            h=h, d=d, n_chunks=n_chunks, sc=sc, scale=scale,
            out_dtype=q.dtype, padded=n_chunks * sc > s, ring=ring,
        )
    scratch_lead = (bc,) if bc > 1 else ()
    state_lead = (*scratch_lead, 2) if packed else scratch_lead
    # Prefetch scalars: lengths[, ring starts][, layer idx] — the layer
    # ref stays LAST (the index maps read p[-1]).
    scalars = [_lengths_for(q, length)]
    if ring:
        scalars.append(_lengths_for(q, start))
    if stacked:
        scalars.append(jnp.reshape(layer, (1,)).astype(jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(bg, n_chunks),
        in_specs=in_specs,
        out_specs=_row_spec(h, dl, stacked, bc),
        scratch_shapes=[
            pltpu.VMEM((*state_lead, h, 1), jnp.float32),  # running max
            pltpu.VMEM((*state_lead, h, 1), jnp.float32),  # running denom
            pltpu.VMEM((*scratch_lead, h, dl), jnp.float32),  # running V acc
        ],
    )
    out_shape = ((bg, bc, h, dl) if bc > 1 else (bg, h, dl))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        interpret=interpret,
    )(*scalars, *inputs)
    return out if bc == 1 else out.reshape(b, h, dl)


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def decode_attention_fused(q, k_cache, v_cache, length, *,
                           interpret=False, layer=None, packed=False,
                           start=None):
    """Fused decode attention. q: (B, H, D); caches: (B, H, S, D) —
    stacked (L, B, H, S, D) when ``layer`` is given; length: scalar or (B,)
    valid rows. Returns (B, H, D) in q.dtype.

    ``packed=True`` takes the head-pair-packed layout instead: q (B, Hp, 2D)
    and caches (…, Hp, S, 2D) with head 2i/2i+1 in lane halves [0:D]/[D:2D]
    (see _build_kernel_packed); returns (B, Hp, 2D).

    ``start`` (B,): RING mode — valid rows are the interval
    [start, start+length) mod S instead of the prefix [0, length) (the
    serving ring cache, models.gpt2; ops.layers._decode_valid_mask is the
    jnp reference)."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=False, deferred=False, packed=packed,
        start=start,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def decode_attention_quant_fused(q, k_cache, k_scale, v_cache, v_scale,
                                 length, *, interpret=False, layer=None,
                                 packed=False, start=None):
    """Fused decode attention over an INT8 cache. k_scale/v_scale:
    (…, H, S) f32 per-(token, head) scales — per-PAIR (…, Hp, S) when
    ``packed`` (one scale per packed 128-lane row). ``start``: ring mode
    (see decode_attention_fused)."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=True, deferred=False,
        k_scale=k_scale, v_scale=v_scale, packed=packed, start=start,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def decode_attention_deferred_fused(q, k_new, v_new, k_cache, v_cache,
                                    length, *, interpret=False, layer=None,
                                    packed=False, start=None):
    """Deferred-append decode attention: attends over ``length`` OLD cache
    rows plus an explicit self-term for the (un-appended) current token —
    mathematically identical to append-then-attend over length+1 rows.
    ``start``: ring mode — the OLD rows are [start, start+length) mod S."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=False, deferred=True,
        k_new=k_new, v_new=v_new, packed=packed, start=start,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def decode_attention_quant_deferred_fused(
    q, k_new, ks_new, v_new, vs_new, k_cache, k_scale, v_cache, v_scale,
    length, *, interpret=False, layer=None, packed=False, start=None,
):
    """Deferred-append decode attention over an INT8 cache. k_new/v_new are
    the already-quantized (B, H, D) int8 rows with (B, H) scales ((B, Hp, 2D)
    rows with (B, Hp) per-pair scales when ``packed``) — the same values the
    cache append stores, so the math is bit-identical to append-then-attend."""
    return _attention_call(
        q=q, k_cache=k_cache, v_cache=v_cache, length=length, layer=layer,
        interpret=interpret, quant=True, deferred=True,
        k_scale=k_scale, v_scale=v_scale,
        k_new=k_new, ks_new=ks_new, v_new=v_new, vs_new=vs_new, packed=packed,
        start=start,
    )

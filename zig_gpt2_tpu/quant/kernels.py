"""Pallas TPU kernel: fused dequant + matmul for weight-only INT8/INT4.

Decode is a GEMV: the weight read dominates HBM traffic, so the win over the
bf16 path is reading 1 (INT8) or 0.5 (INT4) bytes per weight instead of 2.
Per grid program the kernel DMAs one (K, TILE_N) int8/int4 tile into VMEM,
dequantizes it on the VPU (nibble unpack + grouped-scale multiply in f32),
and issues ONE MXU dot against the full activation — tile DMA double-buffers
against the previous program's compute, so the kernel streams weights at HBM
bandwidth instead of serializing per-group partial dots (the naive grouped
formulation measured 94 GB/s vs ~730 GB/s for this design).

Numerics: dequantization happens in float32 (int8 values and f32 scales are
exact), then rounds once to the activation dtype for the MXU dot — for f32
activations the result is exact; for bf16 activations the weight rounds to
bf16 exactly like a dequantized-offline bf16 checkpoint would.

This is the TPU-native replacement for the reference's cblas_sgemm Linear
path (ops.zig:30-45) in quantized mode; tiling follows the pallas_guide
quantization-kernel pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row cap for dispatching these kernels (models.gpt2._gemv_dispatch,
# quant.quantize.quantized_linear): the whole (rows, K) activation block
# stays VMEM-resident per program, so past this the weight-streaming GEMV
# design stops being the right shape and the plain dequant-then-MXU-GEMM
# path wins anyway (prefill). Round 4 capped rows at 64 (the speculative
# B*(k+1) bound, VERDICT r04 item 4); the block_n choosers now budget the
# activation block explicitly, lifting the cap to 256. The w8a8 kernel
# keeps the old 64 cap — its in-kernel f32 activation-quantization
# temporaries scale with rows, and rows > 64 w8a8 routes to the jnp
# w8a8_matmul instead.
GEMV_MAX_ROWS = 256
W8A8_MAX_ROWS = 64


def _kc_for(k: int, group: int, int4: bool) -> int:
    """Dequant chunk rows (0 = whole tile). ~512 keeps the f32 chunk
    temporaries at ~10·kc·TN bytes (vs 10·K·TN for whole-tile dequant —
    the VMEM hog that forced block_n down to 128/256 and left the kernel
    floor at ~0.5 us/program of fixed cost). Chunks must cover whole scale
    groups, stay 128-aligned for the x lane slices, and — for int4 —
    divide K/2 so no chunk straddles the nibble halves."""
    limit = k // 2 if int4 else k
    kc = max(512, group)
    while kc >= max(group, 128):
        # Chunks must cover whole scale groups (kc % group == 0) — a
        # kc that merely divides K mismatches the per-chunk scale slice
        # for non-power-of-two group sizes (e.g. G=192 on K=768).
        if limit % kc == 0 and kc % group == 0:
            return kc
        kc //= 2
    return 0  # tiny-K fallback: whole-tile dequant


def _qmm_kernel(x_ref, qw_ref, scale_ref, out_ref, *, n_groups, group, int4,
                w8a8=False):
    q = qw_ref[:]
    if q.ndim == 3:  # stacked mode: (1, Kp, TN) block — squeeze the layer dim
        q = q[0]
    sc = scale_ref[:]
    if sc.ndim == 3:
        sc = sc[0]
    tile_n = sc.shape[-1]
    k = q.shape[0] * (2 if int4 else 1)
    kc = _kc_for(k, group, int4)
    b = x_ref.shape[0]

    if w8a8:
        # s8×s8 MXU path (per-channel scales only): the MXU loads int8
        # weight elements at 2× the float-operand rate — the only lever
        # past the ~480 Gelem/s GEMV weight-load floor. Activations are
        # dynamically quantized per row HERE (O(B·K), recomputed per
        # program — trivial); the int32 accumulation is exact, so the
        # only new error vs dequant-matmul is the activation rounding.
        xf = x_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(absmax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        step = kc if kc else k
        acc = jnp.zeros((b, tile_n), jnp.int32)
        for c0 in range(0, k, step):
            acc = acc + jnp.dot(xq[:, c0:c0 + step], q[c0:c0 + step],
                                preferred_element_type=jnp.int32)
        out_ref[:] = acc.astype(jnp.float32) * sx * sc[0][None, :]
        return

    if not kc:  # tiny-K fallback: whole-tile dequant (original formulation)
        if int4:
            # Half-split layout (quantize.unpack_int4): low nibbles are
            # rows [0, K/2), high nibbles rows [K/2, K). Extraction in
            # int32 (Mosaic has no 8-bit vector shifts); the concat is
            # along sublanes (static) — the layout exists precisely so
            # unpacking never interleaves lanes.
            p32 = q.astype(jnp.int32)
            q = jnp.concatenate([(p32 << 28) >> 28, (p32 << 24) >> 28],
                                axis=0)
        scale_full = jnp.broadcast_to(
            sc[:, None, :], (n_groups, group, tile_n)
        ).reshape(n_groups * group, tile_n)
        w = (q.astype(jnp.float32) * scale_full).astype(x_ref.dtype)
        out_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
        return

    # K-chunked dequant + MXU partial accumulation: convert/scale only
    # kc rows at a time (bounds the f32 temporaries to kc·TN), one MXU dot
    # per chunk accumulating into f32. For int4 the chunk boundary always
    # falls inside one nibble half (kc | K/2), so each chunk extracts a
    # single nibble — half the shifts of the whole-tile unpack.
    #
    # PER-CHANNEL scales (n_groups == 1) take the fast path: the kernel is
    # VPU-elementwise-bound (~3-4 passes over all K·TN dequant elements ≈
    # the whole 35 us/tile — measured invariant to tiling/DMA size), so
    # skipping the scale broadcast+multiply+f32 round-trip and applying
    # one O(B·TN) post-scale after the dots removes most of the cost:
    # int8 values convert to bf16 EXACTLY, and y = (x @ q) ⊗ scale_n is
    # algebraically dequantize-then-matmul when the scale is per-column.
    per_channel = n_groups == 1
    acc = jnp.zeros((b, tile_n), jnp.float32)
    for c0 in range(0, k, kc):
        if int4:
            half = k // 2
            if c0 < half:  # low nibbles: packed rows [c0, c0+kc)
                p32 = q[c0:c0 + kc].astype(jnp.int32)
                qi = (p32 << 28) >> 28
            else:  # high nibbles: packed rows [c0-half, ...)
                p32 = q[c0 - half:c0 - half + kc].astype(jnp.int32)
                qi = (p32 << 24) >> 28
        else:
            qi = q[c0:c0 + kc]
        if per_channel:
            w = qi.astype(x_ref.dtype)
        else:
            gc = kc // group
            scale_full = jnp.broadcast_to(
                sc[c0 // group:c0 // group + gc][:, None, :],
                (gc, group, tile_n),
            ).reshape(kc, tile_n)
            w = (qi.astype(jnp.float32) * scale_full).astype(x_ref.dtype)
        acc = acc + jnp.dot(x_ref[:, c0:c0 + kc], w,
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc * sc[0][None, :] if per_channel else acc


def _wmm_kernel(x_ref, w_ref, out_ref):
    w = w_ref[:]
    if w.ndim == 3:  # stacked mode: (1, K, TN) block — squeeze the layer dim
        w = w[0]
    out_ref[:] = jnp.dot(x_ref[:], w.astype(x_ref.dtype),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def wmm(
    x: jax.Array,
    w: jax.Array,
    *,
    block_n: int = 0,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """y[B, N] = x[B, K] @ w[K, N] in float32 — the FLOAT-weight decode GEMV.

    Same streaming design as qmm (one (K, TILE_N) weight tile per program,
    double-buffered DMA, one MXU dot), without the dequant. Exists because
    XLA lowers small-batch bf16 GEMVs to VPU multiply-reduce loop fusions
    that stream weights at ~390-455 GB/s (hlo_stats, 124M bf16 B=1 — the
    per-block linears), while the MXU weight-load path runs at ~480 Gelem/s
    (960 GB/s for bf16), making the kernel HBM-bound at ~750 GB/s like the
    lm_head fusion XLA already gets right. Stacked mode (``layer`` given,
    w (L, K, N)) selects the layer inside the index maps via scalar
    prefetch — no per-layer slice materialization, exactly as qmm."""
    b, k = x.shape
    n = w.shape[-1]
    if not block_n:
        # Widest tile whose double-buffered block fits ~8 MB, preferring a
        # width that divides N: edge blocks cost MXU weight-load cycles on
        # the masked columns even though their HBM reads are bounded.
        # rows > 64 (the lifted GEMV cap) additionally budget the resident
        # (b, K) activation block + the f32 out block — small-b tiling is
        # untouched (the proven hot path).
        itemsize = jnp.dtype(w.dtype).itemsize

        def fits_vmem(bn):
            xtra = (b * k * x.dtype.itemsize + 8 * b * bn) if b > 64 else 0
            return 2 * k * bn * itemsize + xtra <= 8 * 1024 * 1024

        fits = [bn for bn in (2048, 1024, 512, 256, 128) if fits_vmem(bn)]
        block_n = next((bn for bn in fits if n % bn == 0),
                       fits[0] if fits else 128)
    block_n = min(block_n, n)
    flops = 2 * b * k * n
    bytes_accessed = (
        w.size // (w.shape[0] if layer is not None else 1) * w.dtype.itemsize
        + x.size * x.dtype.itemsize + b * n * 4
    )
    cost = pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                           transcendentals=0)
    out_shape = jax.ShapeDtypeStruct((b, n), jnp.float32)

    if layer is None:
        return pl.pallas_call(
            _wmm_kernel,
            grid=(pl.cdiv(n, block_n),),
            in_specs=[
                pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, block_n), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (b, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(x, w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, k, block_n), lambda i, idx: (idx[0], 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, block_n), lambda i, idx: (0, i), memory_space=pltpu.VMEM
        ),
    )

    def stacked_kernel(idx_ref, x_ref, w_ref, out_ref):
        del idx_ref  # consumed by the index maps (scalar prefetch)
        _wmm_kernel(x_ref, w_ref, out_ref)

    return pl.pallas_call(
        stacked_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, w)


@functools.partial(jax.jit, static_argnames=("int4", "block_n", "interpret", "w8a8"))
def qmm(
    x: jax.Array,
    qw: jax.Array,
    scale: jax.Array,
    *,
    int4: bool = False,
    block_n: int = 0,
    interpret: bool = False,
    layer=None,
    w8a8: bool = False,
) -> jax.Array:
    """y[B, N] = x[B, K] @ dequant(qw, scale)[K, N] in float32.

    qw: (K, N) int8, or (K/2, N) packed int4. scale: (K/G, N) float32.
    N need not divide block_n: edge blocks compute garbage in the padded
    columns (each output column depends only on its own qw/scale columns)
    and Pallas masks the out-of-range writes.

    Stacked mode (``layer`` given): qw is (L, Kp, N) and scale (L, K/G, N) —
    the whole scan-stacked parameter — and the traced scalar ``layer``
    selects the layer **inside the index map** (scalar prefetch). This lets
    a lax.scan'd decode feed the kernel straight from the stacked HBM buffer
    with NO per-layer dynamic-slice materialization (profiled at ~135 GB/s
    and ~20% of the whole 1.5B decode step when XLA has to copy the slice
    for a custom-call operand).
    """
    b, k = x.shape
    n = qw.shape[-1]
    n_groups = scale.shape[-2]
    group = k // n_groups
    w8a8 = w8a8 and not int4 and n_groups == 1  # per-channel int8 only
    if not block_n:
        # Dtype-aware tiles: pick the widest block whose double-buffered
        # int tile + ~10 B/elem of K-chunked dequant temporaries (see
        # _qmm_kernel) fit ~8 MB. int4's half-size rows earn 2x the width
        # of int8 — fewer programs means less of the ~0.5 us/program fixed
        # cost that made the old 128/256-wide tiles dtype-invariant
        # (BENCHMARKS.md: 25 us for a 1600x6400 tile in EVERY dtype).
        # rows > 64 (the lifted GEMV cap, GEMV_MAX_ROWS) additionally
        # budget the resident (b, K) activation block + the f32 out block;
        # small-b tiling is untouched (the proven hot path).
        rows = qw.shape[-2]
        kc = _kc_for(k, group, int4) or k
        block_n = 128
        for bn in (1024, 512, 256, 128):
            xtra = (b * k * x.dtype.itemsize + 8 * b * bn) if b > 64 else 0
            if 2 * rows * bn + 10 * kc * bn + xtra <= 8 * 1024 * 1024:
                block_n = bn
                break
    block_n = min(block_n, n)
    kernel = functools.partial(
        _qmm_kernel, n_groups=n_groups, group=group, int4=int4, w8a8=w8a8
    )
    flops = 2 * b * k * n
    bytes_accessed = (
        qw.size // (qw.shape[0] if layer is not None else 1)
        + scale.size * 4 + x.size * x.dtype.itemsize + b * n * 4
    )
    cost = pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                           transcendentals=0)
    out_shape = jax.ShapeDtypeStruct((b, n), jnp.float32)

    if layer is None:
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(n, block_n),),
            in_specs=[
                pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (qw.shape[0], block_n), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n_groups, block_n), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (b, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(x, qw, scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, idx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, qw.shape[1], block_n), lambda i, idx: (idx[0], 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_groups, block_n), lambda i, idx: (idx[0], 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, block_n), lambda i, idx: (0, i), memory_space=pltpu.VMEM
        ),
    )
    def stacked_kernel(idx_ref, x_ref, qw_ref, scale_ref, out_ref):
        del idx_ref  # consumed by the index maps (scalar prefetch)
        kernel(x_ref, qw_ref, scale_ref, out_ref)

    return pl.pallas_call(
        stacked_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, qw, scale)

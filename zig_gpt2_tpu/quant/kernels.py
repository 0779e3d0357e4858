"""Pallas TPU kernel: fused dequant + matmul for weight-only INT8/INT4.

Decode is a GEMV: the weight read dominates HBM traffic, so the win over a
dequantize-then-dot XLA graph is reading 1 (INT8) or 0.5 (INT4) bytes per
weight instead of materializing a bf16 copy. The kernel streams (K, TILE_N)
int8 tiles through VMEM, unpacks/dequantizes on the VPU, and accumulates
per-group partial dots on the MXU with the float32 group scales applied to
the partial sums — bit-identical to quantize.dequantize_linear + jnp.dot at
float32 scale precision.

Layout note: the activation is passed TRANSPOSED as (K, B). Group offsets
(multiples of 32/64/128) are legal dynamic-slice indices only on the sublane
(second-to-last) axis — Mosaic requires lane-axis slices to be 128-aligned —
so the contraction axis K must live on sublanes for *both* operands.

This is the TPU-native replacement for the reference's cblas_sgemm Linear
path (ops.zig:30-45) in quantized mode; the grid/tiling design follows the
pallas_guide quantization-kernel pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(xt_ref, qw_ref, scale_ref, out_ref, *, n_groups, group, int4):
    half = n_groups // 2

    def body(g, acc):
        xg = xt_ref[pl.ds(pl.multiple_of(g * group, group), group), :]  # (G, B)
        if int4:
            # Half-split layout (quantize.unpack_int4): group g < half lives
            # in the low nibbles of packed rows [g·G, (g+1)·G); group
            # g >= half in the high nibbles of rows [(g−half)·G, ...).
            # Arithmetic shifts sign-extend int8.
            row = jax.lax.rem(g, half) * group
            packed = qw_ref[pl.ds(pl.multiple_of(row, group), group), :]
            # Nibble extraction in int32 — Mosaic has no 8-bit vector shifts.
            p32 = packed.astype(jnp.int32)
            lo = (p32 << 28) >> 28
            hi = (p32 << 24) >> 28
            qg = jnp.where(g < half, lo, hi)
        else:
            qg = qw_ref[pl.ds(pl.multiple_of(g * group, group), group), :]
        # int8 values are exact in bf16 (|q| <= 127 < 256).
        wg = qg.astype(xt_ref.dtype)
        part = jax.lax.dot_general(  # (G, B)ᵀ(G, TN) -> (B, TN)
            xg, wg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sg = scale_ref[g, :].astype(jnp.float32)
        return acc + part * sg[None, :]

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, n_groups, body, acc)


@functools.partial(jax.jit, static_argnames=("int4", "block_n", "interpret"))
def qmm(
    x: jax.Array,
    qw: jax.Array,
    scale: jax.Array,
    *,
    int4: bool = False,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """y[B, N] = x[B, K] @ dequant(qw, scale)[K, N] in float32.

    qw: (K, N) int8, or (K/2, N) packed int4. scale: (K/G, N) float32.
    N need not divide block_n: edge blocks compute garbage in the padded
    columns (each output column depends only on its own qw/scale columns)
    and Pallas masks the out-of-range writes.
    """
    b, k = x.shape
    n = qw.shape[-1]
    n_groups = scale.shape[-2]
    group = k // n_groups
    xt = x.T  # contraction axis on sublanes (see module docstring)
    kernel = functools.partial(
        _qmm_kernel, n_groups=n_groups, group=group, int4=int4
    )
    flops = 2 * b * k * n
    bytes_accessed = qw.size + scale.size * 4 + x.size * x.dtype.itemsize + b * n * 4
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((k, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (qw.shape[0], block_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_groups, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(xt, qw, scale)

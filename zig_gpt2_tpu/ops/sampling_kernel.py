"""Pallas TPU kernel: fused temperature-scale + categorical sampling.

The reference samples with ``logits /= temp; softmax; weightedIndex``
(main.zig:198-207). On TPU the softmax is unnecessary: Gumbel-max sampling
(``argmax(logits/T + G)`` with G ~ Gumbel(0,1)) draws from exactly the same
categorical distribution with one pass over the logits and no
normalization. This kernel fuses the temperature scale, the Gumbel noise
(native per-core PRNG — ``pltpu.prng_random_bits``, far cheaper than
XLA's counter-based threefry), and the argmax, per batch row.

Uniform variates come from the standard bit trick: the top 23 random bits
become the mantissa of a float in [1, 2), minus 1 → U[0, 1); a tiny offset
keeps log(u) finite.

Dispatch (runtime/sampling.py): TPU + temperature > 0, including top-k and
top-p — those arrive as a per-row logit THRESHOLD (the smallest kept raw
logit, derived outside with the same masking code as the jnp path) and the
kernel masks `logit < thresh` out of the draw. The jax.random path remains
for greedy, CPU, and SPMD tracing. NOTE the two paths draw from the same
distribution but different random streams — each is deterministic under
its own seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(
    jax.jit, static_argnames=("temperature", "interpret", "return_max")
)
def sample_categorical(
    logits: jax.Array,
    seed: jax.Array,
    temperature: float,
    thresh: jax.Array | None = None,
    *,
    interpret: bool = False,
    return_max: bool = False,
) -> jax.Array:
    """(B, V) logits -> (B,) int32 token ids ~ softmax(logits/temperature).

    seed: (B,) int32. Seeding is BLOCK-granular: the native PRNG is seeded
    once per 8-row sublane block, with every row's seed folded into the
    block seed (so changing ANY row's seed changes its block's draws — a
    caller holding persistent per-slot seeds still gets fresh noise, just
    correlated within a block). Callers wanting fully independent rows
    should derive all B seeds from one key per step, as
    runtime/sampling.py does.

    return_max: also return the winning perturbed value z* = max_j
    (logit_j/T + G_j) per row, (B,) f32 — the vocab-sharded sampler
    (parallel/shard_kernels.sample_sharded) runs this kernel per shard
    and argmaxes z* across shards, which is EXACTLY global Gumbel-max
    (shard seeds decorrelated by the caller).

    thresh: optional (B,) f32 per-row logit cutoff — rows with
    ``logit < thresh`` are excluded from the draw. This is how top-k and
    top-p ride the kernel: the caller computes the k-th-largest logit (or
    the nucleus boundary logit) OUTSIDE and the kernel turns it into a
    support mask, keeping ties inclusive exactly like the jnp path
    (runtime/sampling.py)."""
    b, v = logits.shape
    inv_t = 1.0 / float(temperature)
    # Row-block size: 8 (sublane tile) for batches, but small batches use
    # ONE full-array block — Mosaic allows a block equal to the array dims
    # regardless of alignment, and an 8-row block over B=1 logits made the
    # kernel stream 8x the (B, 50257) bytes it needed.
    rows = b if b <= 8 else 8
    n_blocks = pl.cdiv(b, rows)
    masked = thresh is not None

    def kernel(seed_ref, *refs):
        it = iter(refs)
        thr_ref = next(it) if masked else None
        x_ref = next(it)
        out_ref = next(it)
        z_ref = next(it) if return_max else None
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[i])
        bits = pltpu.prng_random_bits((rows, v))
        mantissa = jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9)
        )
        u = pltpu.bitcast(
            mantissa | jnp.uint32(0x3F800000), jnp.float32
        ) - 1.0  # U[0, 1)
        gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
        x = x_ref[:].astype(jnp.float32)
        z = x * inv_t + gumbel  # (rows, V)
        if masked:
            z = jnp.where(x >= thr_ref[:], z, -jnp.inf)
        m = jnp.max(z, axis=-1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, (rows, v), 1)
        out_ref[:] = jnp.min(jnp.where(z == m, ids, v), axis=-1, keepdims=True)
        if return_max:
            z_ref[:] = m

    in_specs = []
    extra = []
    if masked:
        in_specs.append(pl.BlockSpec((rows, 1), lambda i, s: (i, 0),
                                     memory_space=pltpu.VMEM))
        extra.append(
            jnp.asarray(thresh, jnp.float32).reshape(b, 1)
        )
    in_specs.append(pl.BlockSpec((rows, v), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((rows, 1), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, 1), jnp.int32)
    if return_max:
        out_specs = (out_specs, pl.BlockSpec((rows, 1), lambda i, s: (i, 0),
                                             memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((b, 1), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    # One seed per row-block, mixing in EVERY row's seed (distinct odd
    # multipliers keep permuted row seeds from colliding; int32 wraparound
    # is fine — it's a seed, not arithmetic).
    padded = jnp.zeros((n_blocks * rows,), jnp.int32).at[:b].set(
        seed.astype(jnp.int32)
    ).reshape(n_blocks, rows)
    mults = (2 * jnp.arange(rows, dtype=jnp.int32) + 1)[None, :]
    block_seeds = jnp.sum(padded * mults, axis=1, dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_seeds, *extra, logits)
    if return_max:
        return out[0][:, 0], out[1][:, 0]
    return out[:, 0]

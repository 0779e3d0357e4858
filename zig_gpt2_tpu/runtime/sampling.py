"""Token sampling.

The reference samples with ``logits /= temp; softmax; rng.weightedIndex`` and
re-seeds from the wall clock every token (main.zig:198-207 — irreproducible by
design). Here sampling is a pure jittable function over a threaded PRNG key:
``jax.random.categorical(key, logits/temp)`` is exactly the reference's
multinomial-over-softmax, reproducible, batched, and fusable into the decode
step. Temperature 0 means greedy argmax; top-k restricts to the k best logits.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _under_spmd() -> bool:
    """True when tracing under a non-trivial abstract mesh (GSPMD would have
    to partition the Pallas custom call, which it cannot). A FULLY-MANUAL
    mesh (inside a shard_map body, e.g. the step-level decode of
    parallel/step_spmd) is NOT spmd in this sense: the body already sees
    per-shard shapes, and the custom call runs per device."""
    try:
        from jax.sharding import AxisType, get_abstract_mesh

        m = get_abstract_mesh()
        if not m.axis_names:
            return False
        return not all(t == AxisType.Manual for t in m.axis_types)
    except Exception:
        return False


def sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    use_kernel: bool = True,
    mesh=None,
) -> jax.Array:
    """Draw next tokens from (B, vocab) logits -> (B,) int32.

    temperature and top_k are static (python) values — they select the traced
    graph, which is how a jitted decode loop wants them.

    On TPU the plain-temperature path uses the fused Pallas Gumbel-max
    kernel (ops/sampling_kernel.py — native PRNG, no softmax, no threefry);
    greedy / top-k / CPU / SPMD use jax.random. Both are exactly categorical
    and deterministic per seed, but their random streams differ.

    Pass ``use_kernel=False`` when the logits are mesh-sharded (callers
    thread ``not config.spmd`` — mirroring the dispatch guards on the
    attention/qmm kernels); ``_under_spmd()`` is the belt-and-suspenders
    check for callers that forget. With ``mesh`` given (sharded serving),
    the kernel runs PER VOCAB SHARD under shard_map with a cross-shard
    argmax of the winning Gumbel values — exactly categorical, no (B, V)
    threefry and no logits all-gather (parallel/shard_kernels).
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    backend_tpu = jax.default_backend() == "tpu"
    # TPU-only (no interpret escape hatch: the native PRNG has no CPU
    # lowering — the same reason tests/test_sampling_kernel.py is
    # TPU-gated); CPU mesh runs keep the jax.random path.
    sharded = (
        mesh is not None and backend_tpu
        and os.environ.get("ZG2_SPMD_KERNELS") != "0"
    )
    if sharded or (use_kernel and backend_tpu and not _under_spmd()):
        from zig_gpt2_tpu.ops.sampling_kernel import sample_categorical

        # Independent per-row seeds derived from the key (one cheap
        # threefry draw for B scalars; the heavy (B, V) noise comes from
        # the kernel's native PRNG).
        seeds = jax.random.randint(
            key, (logits.shape[0],), 0, jnp.iinfo(jnp.int32).max, jnp.int32
        )
        thresh = None
        if (top_k is not None and top_k < logits.shape[-1]) or (
            top_p is not None and top_p < 1.0
        ):
            # top-k / top-p both reduce to "keep logits >= a per-row
            # threshold" (the kept set is always a prefix of the sorted
            # row). Compute the kept SET with the SAME masking code as the
            # jnp path, then hand the kernel the smallest kept RAW logit
            # as the threshold (an actual array element — no /T·T rounding
            # at the boundary) — skipping the (B, V) threefry noise and
            # categorical reduction.
            raw = logits.astype(jnp.float32)
            scaled = _mask_logits(raw / temperature, top_k, top_p)
            thresh = jnp.min(
                jnp.where(jnp.isneginf(scaled), jnp.inf, raw), axis=-1
            )
        if sharded:
            from zig_gpt2_tpu.parallel.shard_kernels import sample_sharded

            return sample_sharded(logits, seeds, temperature, thresh,
                                  mesh=mesh)
        return sample_categorical(logits, seeds, temperature, thresh)
    logits = _mask_logits(logits.astype(jnp.float32) / temperature,
                          top_k, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_manual(
    logits: jax.Array,
    key: jax.Array,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    axis: str,
    tp: int = 1,
    data_axis: Optional[str] = None,
    dp: int = 1,
) -> jax.Array:
    """Vocab-sharded sampling INSIDE a shard_map body (the step-level decode
    of parallel/step_spmd): ``logits`` is this shard's contiguous (B, V/tp)
    vocab slice, ``key`` is replicated, and the result is the (B,) GLOBAL
    token ids, identical on every shard.

    Same scheme as parallel.shard_kernels.sample_sharded, relocated into the
    manual body: each shard draws its own noise (decorrelated by axis_index)
    and contributes its local argmax plus the winning perturbed value; the
    cross-shard argmax of those winners IS the global Gumbel-max — exactly
    categorical, no (B, V) gather of noise. On TPU the per-shard draw is the
    fused Pallas kernel (native PRNG — same stream as sample_sharded for
    dp=1); elsewhere jax.random Gumbel noise per shard. Greedy (T=0) is a
    plain two-level argmax. top-k/top-p derive the per-row threshold from an
    all-gather of the raw logits (O(B·V) — once per step, and only when
    those knobs are on).

    ``data_axis``/``dp``: when the batch is data-sharded (dp > 1), each
    data shard must draw INDEPENDENT noise — the key is replicated, so
    without this every data shard's local row i would get byte-identical
    seeds (two requests on different shards would decode correlated
    continuations). Folding the data-axis index into the key fixes it;
    dp == 1 skips the fold so the stream matches sample_sharded exactly."""
    vl = logits.shape[-1]
    w = jax.lax.axis_index(axis)
    if dp > 1 and data_axis is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
    if temperature == 0.0:
        z_l = jnp.max(logits, axis=-1)
        idx_l = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        thresh = None
        # The top-k gate compares against the GLOBAL vocab width (tp
        # shards of vl columns each): top_k in [vl, V) still truncates.
        if (top_k is not None and top_k < vl * tp) or (
            top_p is not None and top_p < 1.0
        ):
            # The support cutoff needs the global row (see sample()): gather
            # raw logits, reuse the same masking code, keep the smallest
            # kept RAW logit as the threshold.
            raw = jax.lax.all_gather(
                logits, axis, axis=logits.ndim - 1, tiled=True
            ).astype(jnp.float32)
            scaled = _mask_logits(raw / temperature, top_k, top_p)
            thresh = jnp.min(
                jnp.where(jnp.isneginf(scaled), jnp.inf, raw), axis=-1
            )
        if jax.default_backend() == "tpu":
            from zig_gpt2_tpu.ops.sampling_kernel import sample_categorical

            seeds = jax.random.randint(
                key, (logits.shape[0],), 0, jnp.iinfo(jnp.int32).max, jnp.int32
            )
            seeds = seeds ^ ((w + 1) * jnp.int32(-1640531527))
            idx_l, z_l = sample_categorical(
                logits, seeds, temperature, thresh, return_max=True
            )
        else:
            scaled = logits.astype(jnp.float32) / temperature
            if thresh is not None:
                scaled = jnp.where(
                    logits.astype(jnp.float32) < thresh[:, None],
                    -jnp.inf, scaled,
                )
            z = scaled + jax.random.gumbel(
                jax.random.fold_in(key, w), scaled.shape, jnp.float32
            )
            z_l = jnp.max(z, axis=-1)
            idx_l = jnp.argmax(z, axis=-1).astype(jnp.int32)
    z_all = jax.lax.all_gather(z_l, axis)      # (tp, B)
    idx_all = jax.lax.all_gather(idx_l, axis)  # (tp, B)
    win = jnp.argmax(z_all, axis=0)            # (B,)
    local = jnp.take_along_axis(idx_all, win[None, :], axis=0)[0]
    return (win * vl + local).astype(jnp.int32)


def _mask_logits(
    logits: jax.Array, top_k: Optional[int], top_p: Optional[float]
) -> jax.Array:
    """Set logits outside the top-k / nucleus support to -inf (shared by
    the jnp sampling path and the kernel's threshold derivation)."""
    if top_k is not None and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        # Nucleus sampling: keep the smallest prefix of the sorted
        # distribution whose mass reaches top_p (the token crossing the
        # threshold stays included).
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p  # first token always kept
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits

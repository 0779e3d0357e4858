"""Fused Gumbel-max sampling kernel: distributional + determinism tests.

TPU-only: pltpu.prng_seed has no CPU/interpret lowering, so these skip in
the CPU suite and run via ``pytest tests/test_sampling_kernel.py`` on a
machine with a chip (scripts/verify drives them; bench.py exercises the
kernel every run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.ops.sampling_kernel import sample_categorical

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="native TPU PRNG only"
)


def test_matches_categorical_distribution(rng):
    """Empirical frequencies must match softmax(logits/T) (chi-square-ish)."""
    V, T = 16, 0.7
    logits = jnp.asarray(rng.standard_normal((1, V)) * 2.0, jnp.float32)
    n = 4000
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32)
    # Draw n samples by batching the same logits row with different seeds.
    draws = sample_categorical(
        jnp.broadcast_to(logits, (n, V)), seeds, T
    )
    counts = np.bincount(np.asarray(draws), minlength=V)
    p = jax.nn.softmax(logits[0] / T)
    expected = np.asarray(p) * n
    # Allow 5-sigma per bucket on the multinomial std.
    std = np.sqrt(expected * (1 - np.asarray(p)) + 1e-9)
    assert np.all(np.abs(counts - expected) < 5 * std + 5), (
        counts, expected.round(1))


def test_deterministic_per_seed(rng):
    logits = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    seeds = jnp.asarray([1, 2, 3, 4], jnp.int32)
    a = sample_categorical(logits, seeds, 1.0)
    b = sample_categorical(logits, seeds, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sample_categorical(logits, seeds + 7, 1.0)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_masked_vocab_never_sampled(rng):
    """MASK_VALUE'd (padded-vocab) columns must never win."""
    from zig_gpt2_tpu.ops.layers import MASK_VALUE

    V, real = 32, 20
    logits = np.zeros((8, V), np.float32)
    logits[:, real:] = MASK_VALUE
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, 8), jnp.int32)
    draws = np.asarray(sample_categorical(
        jnp.asarray(logits), seeds, 0.8
    ))
    assert (draws < real).all(), draws


def test_low_temperature_concentrates(rng):
    logits = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, 16), jnp.int32)
    draws = sample_categorical(logits, seeds, 0.001)
    np.testing.assert_array_equal(
        np.asarray(draws), np.asarray(jnp.argmax(logits, -1))
    )


def test_threshold_restricts_support(rng):
    """thresh masks logits below the per-row cutoff (the top-k/top-p path:
    runtime/sampling derives thresh as the k-th / nucleus-boundary logit)."""
    V = 64
    logits = jnp.asarray(rng.standard_normal((8, V)), jnp.float32)
    k = 4
    kth = jax.lax.top_k(logits, k)[0][:, -1]
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, 8), jnp.int32)
    draws = np.asarray(sample_categorical(logits, seeds, 1.0, kth))
    topk_ids = np.asarray(jax.lax.top_k(logits, k)[1])
    for b in range(8):
        assert draws[b] in topk_ids[b], (b, draws[b], topk_ids[b])


def test_sample_top_k_uses_kernel_and_restricts(rng):
    """End-to-end: runtime sample() with top_k on TPU draws only top-k ids
    and is deterministic per key."""
    from zig_gpt2_tpu.runtime.sampling import sample

    logits = jnp.asarray(rng.standard_normal((16, 128)) * 3, jnp.float32)
    key = jax.random.PRNGKey(5)
    draws = np.asarray(sample(logits, key, temperature=1.0, top_k=3))
    topk_ids = np.asarray(jax.lax.top_k(logits, 3)[1])
    for b in range(16):
        assert draws[b] in topk_ids[b]
    np.testing.assert_array_equal(
        draws, np.asarray(sample(logits, key, temperature=1.0, top_k=3))
    )


def test_threshold_distribution_matches_masked_categorical(rng):
    """Empirical frequencies under a threshold == softmax over the kept
    support (top-k=3 of 16)."""
    V, T, k = 16, 0.9, 3
    logits = jnp.asarray(rng.standard_normal((1, V)) * 2.0, jnp.float32)
    kth = jax.lax.top_k(logits, k)[0][:, -1]
    n = 4000
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32)
    draws = sample_categorical(
        jnp.broadcast_to(logits, (n, V)),
        seeds, T, jnp.broadcast_to(kth, (n,)),
    )
    counts = np.bincount(np.asarray(draws), minlength=V)
    masked = jnp.where(logits[0] >= kth, logits[0] / T, -jnp.inf)
    p = np.asarray(jax.nn.softmax(masked))
    expected = p * n
    std = np.sqrt(expected * (1 - p) + 1e-9)
    assert np.all(np.abs(counts - expected) < 5 * std + 5), (counts, expected)


def test_single_row_batch(rng):
    """B=1 uses one full-array block (no 8-row padding reads)."""
    logits = jnp.asarray(rng.standard_normal((1, 128)) * 3, jnp.float32)
    seeds = jnp.asarray([42], jnp.int32)
    a = np.asarray(sample_categorical(logits, seeds, 0.8))
    assert a.shape == (1,) and 0 <= a[0] < 128
    np.testing.assert_array_equal(
        a, np.asarray(sample_categorical(logits, seeds, 0.8)))
    greedy = np.asarray(sample_categorical(logits, seeds, 0.001))
    np.testing.assert_array_equal(greedy, np.asarray(jnp.argmax(logits, -1)))


def test_return_max_and_sharded_sampler(rng):
    """return_max yields the winning perturbed value, and the vocab-sharded
    sampler (mesh 1x1 on the single real chip) draws from the same
    distribution and is deterministic per seed."""
    from zig_gpt2_tpu.parallel import mesh as pmesh
    from zig_gpt2_tpu.parallel.shard_kernels import sample_sharded

    V = 64
    logits = jnp.asarray(rng.standard_normal((8, V)) * 2, jnp.float32)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, 8), jnp.int32)
    idx, z = sample_categorical(logits, seeds, 1.0, return_max=True)
    assert idx.shape == (8,) and z.shape == (8,)
    # z* must be >= the chosen token's scaled logit (Gumbel noise >= -inf)
    chosen = np.take_along_axis(np.asarray(logits), np.asarray(idx)[:, None], 1)[:, 0]
    assert (np.asarray(z) >= chosen - 60).all()  # log(u) floor ~ -46

    mesh = pmesh.make_mesh(1, 1)
    a = np.asarray(sample_sharded(logits, seeds, 0.8, mesh=mesh))
    b = np.asarray(sample_sharded(logits, seeds, 0.8, mesh=mesh))
    np.testing.assert_array_equal(a, b)
    assert ((0 <= a) & (a < V)).all()
    # Distribution: batch the same row with many seeds, compare to softmax.
    n = 4000
    row = jnp.broadcast_to(logits[:1], (n, V))
    many = jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32)
    draws = np.asarray(sample_sharded(row, many, 0.8, mesh=mesh))
    counts = np.bincount(draws, minlength=V)
    p = np.asarray(jax.nn.softmax(logits[0] / 0.8))
    expected = p * n
    std = np.sqrt(expected * (1 - p) + 1e-9)
    assert np.all(np.abs(counts - expected) < 5 * std + 5)

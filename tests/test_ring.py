"""RING KV cache (GPTConfig.ring_cache — the serving append fix, round 5).

Semantics under test: cache ROW is decoupled from token POSITION — a lane's
valid rows are the ring interval [start, start+length) mod S, and decode
appends land at one shared scalar write pointer. Attention over a row SET
is permutation-invariant, so a ring cache holding the SAME rows rotated by
any shift must attend identically (to f32 reduction-order roundoff).

Oracles:
- jnp reference: rotated cache + start == linear cache (decode_attention).
- fused kernels (interpret mode): ring variants vs the jnp ring reference.
- end-to-end: the ring ContinuousBatcher (default) produces exactly the
  greedy token streams of the linear batcher (ZG2_RING=0), through slot
  reuse, divergent admission positions, and write-pointer wraparound.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.ops import attention as A
from zig_gpt2_tpu.ops import layers as ops

GREEDY = SamplingConfig(temperature=0.0, seed=0)


def _roll_lanes(c, shifts, axis):
    """Rotate each batch lane's S axis by its own shift."""
    return jnp.stack(
        [jnp.roll(c[b], shifts[b], axis=axis - 1) for b in range(c.shape[0])]
    )


def _mk(rng, b, h, s, d):
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    return q, k, v


def test_jnp_ring_mask_matches_linear(rng):
    B, H, S, D = 3, 2, 24, 16
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([5, 24 - 7, 1], jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    # Rotate each lane so its valid rows start mid-ring (incl. wraparound).
    shifts = jnp.asarray([3, 10, 23], jnp.int32)
    got = ops.decode_attention(
        q, _roll_lanes(k, shifts, axis=2), _roll_lanes(v, shifts, axis=2),
        length, start=shifts,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    kq, ks = ops.quantize_kv(k)
    vq, vs = ops.quantize_kv(v)
    want_q = ops.decode_attention_quant(q, kq, ks, vq, vs, length)
    got_q = ops.decode_attention_quant(
        q, _roll_lanes(kq, shifts, axis=2), _roll_lanes(ks, shifts, axis=2),
        _roll_lanes(vq, shifts, axis=2), _roll_lanes(vs, shifts, axis=2),
        length, start=shifts,
    )
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               rtol=1e-5, atol=1e-5)


def test_fused_ring_parity(rng):
    """Fused kernel (interpret) with ring starts vs the jnp ring mask —
    fp and INT8, appended and deferred."""
    B, H, S, D = 2, 4, 16, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([9, 14], jnp.int32)
    start = jnp.asarray([11, 4], jnp.int32)  # lane 0 wraps
    want = ops.decode_attention(q, k, v, length, start=start)
    got = A.decode_attention_fused(q, k, v, length, start=start,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    kq, ks = ops.quantize_kv(k)
    vq, vs = ops.quantize_kv(v)
    want_q = ops.decode_attention_quant(q, kq, ks, vq, vs, length,
                                        start=start)
    got_q = A.decode_attention_quant_fused(q, kq, ks, vq, vs, length,
                                           start=start, interpret=True)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               rtol=2e-2, atol=5e-3)

    # Deferred: old rows are the ring interval; self-term appended by the
    # kernel. Reference: write the new row at the interval END (ring row
    # (start+length) mod S) and attend over length+1 rows.
    k_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    wrow = (start + length) % S

    def put(c, r):
        return jax.vmap(
            lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                cb, rb[:, None, :], pb, axis=1)
        )(c, r, wrow)

    want_d = ops.decode_attention(q, put(k, k_new), put(v, v_new),
                                  length + 1, start=start)
    got_d = A.decode_attention_deferred_fused(q, k_new, v_new, k, v, length,
                                              start=start, interpret=True)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-5, atol=1e-5)


def test_fused_ring_parity_packed(rng):
    """Ring + head-pair-packed (the TPU serving combination): packed
    deferred INT8 kernel vs the jnp ring reference on unpacked views."""
    B, H, S, D = 2, 4, 16, 64
    q, kf, vf = _mk(rng, B, H, S, D)
    kq, ks = ops.quantize_kv(A.pack_heads_seq(kf))   # per-pair
    vq, vs = ops.quantize_kv(A.pack_heads_seq(vf))
    knew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    vnew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    knq, kns = ops.quantize_kv(A.pack_heads_rows(knew))
    vnq, vns = ops.quantize_kv(A.pack_heads_rows(vnew))
    length = jnp.asarray([7, 13], jnp.int32)
    start = jnp.asarray([12, 5], jnp.int32)
    wrow = (start + length) % S

    def put(c, r):
        return jax.vmap(
            lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                cb, rb[:, None, :].astype(cb.dtype), pb, axis=1)
        )(c, r, wrow)

    def puts(c, r):
        return jax.vmap(
            lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                cb, rb[:, None], pb, axis=1)
        )(c, r, wrow)

    want = ops.decode_attention_quant(
        q,
        put(A.unpack_heads_seq(kq), A.unpack_heads_rows(knq)),
        puts(A.unpack_pair_scales_seq(ks), A.unpack_pair_scales_rows(kns)),
        put(A.unpack_heads_seq(vq), A.unpack_heads_rows(vnq)),
        puts(A.unpack_pair_scales_seq(vs), A.unpack_pair_scales_rows(vns)),
        length + 1, start=start,
    )
    got = A.decode_attention_quant_deferred_fused(
        A.pack_heads_rows(q), knq, kns, vnq, vns, kq, ks, vq, vs,
        length, start=start, interpret=True, packed=True,
    )
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=2e-2, atol=5e-3,
    )


# --- end-to-end: ring batcher vs linear batcher ---------------------------

@pytest.fixture(scope="module")
def params():
    p = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
    return jax.tree.map(lambda x: x * 3.0, p)  # diversify greedy streams


def _serve(params, prompts, max_new, ring, monkeypatch, **kw):
    from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

    monkeypatch.setenv("ZG2_RING", "1" if ring else "0")
    b = ContinuousBatcher(GPT2_NANO, params, max_seq=48, prompt_buckets=(16,),
                          sampling=GREEDY, **kw)
    assert b._ring == ring
    rids = [b.submit(p, max_new_tokens=max_new) for p in prompts]
    done = b.run()
    by_rid = {r.rid: r.generated for r in done}
    return [by_rid[r] for r in rids], b


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_ring_batcher_greedy_identity(params, rng, monkeypatch, kv_quant):
    """Ring serving == linear serving, token for token, across divergent
    admission positions and slot reuse. (The score SETS are identical;
    only f32 summation order differs — greedy streams stay equal on this
    model, making the strongest available oracle.)"""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (3, 9, 5, 12, 7, 4)]
    want, _ = _serve(params, prompts, 10, ring=False, monkeypatch=monkeypatch,
                     batch_size=2, kv_quant=kv_quant)
    got, b = _serve(params, prompts, 10, ring=True, monkeypatch=monkeypatch,
                    batch_size=2, kv_quant=kv_quant)
    assert got == want
    assert "wptr" in b.cache and "start" in b.cache


def test_ring_wptr_wraparound(params, rng, monkeypatch):
    """Enough short requests through one slot to wrap the write pointer
    past R several times — outputs must still match linear serving."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, 4))
               for _ in range(12)]
    want, _ = _serve(params, prompts, 12, ring=False,
                     monkeypatch=monkeypatch, batch_size=1)
    got, b = _serve(params, prompts, 12, ring=True, monkeypatch=monkeypatch,
                    batch_size=1)
    assert got == want
    rows = b.cache["k"].shape[-2]
    # 12 requests x 12 decode steps each >> R = 49: the pointer wrapped.
    assert 12 * 12 > 2 * rows


def test_ring_chunked_decode(params, rng, monkeypatch):
    """decode_chunk > 1 under ring (the wptr advances inside the on-device
    scan) — identical to linear chunked serving."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (3, 8, 5, 11)]
    want, _ = _serve(params, prompts, 9, ring=False, monkeypatch=monkeypatch,
                     batch_size=2, decode_chunk=4)
    got, _ = _serve(params, prompts, 9, ring=True, monkeypatch=monkeypatch,
                    batch_size=2, decode_chunk=4)
    assert got == want


def test_ring_prefix_cache_admissions(params, rng, monkeypatch):
    """Prefix-hit admissions (extend on the linear stored cache, rotated
    on splice) under ring == linear serving with the same prefix cache."""
    prefix = list(rng.integers(0, GPT2_NANO.vocab_size, 6))
    prompts = [prefix + list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (2, 5, 3, 7)]

    def run(ring):
        from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

        monkeypatch.setenv("ZG2_RING", "1" if ring else "0")
        b = ContinuousBatcher(GPT2_NANO, params, batch_size=2, max_seq=48,
                              prompt_buckets=(16,), sampling=GREEDY)
        b.register_prefix(prefix)
        rids = [b.submit(p, max_new_tokens=8) for p in prompts]
        done = b.run()
        by_rid = {r.rid: r.generated for r in done}
        assert b.metrics.prefix_hits == len(prompts)
        return [by_rid[r] for r in rids]

    assert run(True) == run(False)


def test_ring_decode_step_unit(params):
    """One jitted ring decode_step: write lands at wptr for every lane,
    lengths advance, wptr wraps mod R."""
    config = dataclasses.replace(GPT2_NANO, ring_cache=True)
    cache = gpt2.init_kv_cache(config, batch_size=2, max_seq=10)
    R = cache["k"].shape[-2]
    cache["start"] = jnp.asarray([3, 7], jnp.int32)
    cache["length"] = jnp.asarray([2, 4], jnp.int32)
    cache["wptr"] = jnp.asarray(R - 1, jnp.int32)
    toks = jnp.asarray([1, 2], jnp.int32)
    new, logits = jax.jit(
        lambda p, c, t: gpt2.decode_step(p, c, t, config)
    )(params, cache, toks)
    assert int(new["wptr"]) == 0  # wrapped
    assert np.asarray(new["length"]).tolist() == [3, 5]
    assert np.asarray(new["start"]).tolist() == [3, 7]
    # Both lanes' K rows were written at ring row R-1 of every layer.
    assert not np.allclose(np.asarray(new["k"][:, :, :, R - 1]), 0.0)

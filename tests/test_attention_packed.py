"""Head-pair-PACKED decode-attention kernel parity (interpret mode).

The packed layout stores two heads per 128-lane row (caches (…, Hp, S, 2D))
so the kernel's 3-D VPU passes run at full lane occupancy — see
ops/attention._build_kernel_packed. INT8 scales are per-PAIR: quantize_kv
runs on the PACKED rows, one scale per (pair, token), planes (…, Hp, S).
Every test builds UNPACKED data, packs it with the layout helpers, and
checks the packed kernel against the jnp reference on the unpacked views —
for quant, the reference uses the SAME per-pair quantized values with the
scales repeated per head, so the comparison bounds only the bf16-vs-f32
compute-path difference, never the quantization error itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.ops import attention as A
from zig_gpt2_tpu.ops import layers as ops


def _mk(rng, b, h, s, d, dtype=np.float32):
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32).astype(dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32).astype(dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32).astype(dtype)
    return q, k, v


def _pack_cache(c):  # (B, H, S, D) -> (B, Hp, S, 2D)
    return A.pack_heads_seq(c)


def _quant_pair_cache(c):
    """(B, H, S, D) float -> (packed int8 (B, Hp, S, 2D), per-pair plane
    (B, Hp, S), per-head reference views (B, H, S, D) int8 / (B, H, S))."""
    pq, ps = ops.quantize_kv(A.pack_heads_seq(c))
    return pq, ps, A.unpack_heads_seq(pq), A.unpack_pair_scales_seq(ps)


def _quant_pair_rows(r):
    """(B, H, D) float -> (packed int8 (B, Hp, 2D), per-pair (B, Hp),
    per-head views (B, H, D) int8 / (B, H))."""
    rq, rs = ops.quantize_kv(A.pack_heads_rows(r))
    return rq, rs, A.unpack_heads_rows(rq), A.unpack_pair_scales_rows(rs)


def test_layout_helpers_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((3, 6, 64)), jnp.float32)
    assert np.array_equal(A.unpack_heads_rows(A.pack_heads_rows(x)), x)
    c = jnp.asarray(rng.standard_normal((2, 4, 16, 64)), jnp.float32)
    p = A.pack_heads_seq(c)
    assert p.shape == (2, 2, 16, 128)
    # lane halves hold adjacent heads
    assert np.array_equal(np.asarray(p[:, 1, :, :64]), np.asarray(c[:, 2]))
    assert np.array_equal(np.asarray(p[:, 1, :, 64:]), np.asarray(c[:, 3]))
    # per-pair scale views: both heads of a pair see the pair's scale
    s = jnp.asarray(rng.standard_normal((2, 2)), jnp.float32)  # (B, Hp)
    u = A.unpack_pair_scales_rows(s)
    assert u.shape == (2, 4)
    assert np.array_equal(np.asarray(u[:, 0]), np.asarray(s[:, 0]))
    assert np.array_equal(np.asarray(u[:, 1]), np.asarray(s[:, 0]))
    assert np.array_equal(np.asarray(u[:, 3]), np.asarray(s[:, 1]))
    ss = jnp.asarray(rng.standard_normal((2, 2, 16)), jnp.float32)
    us = A.unpack_pair_scales_seq(ss)
    assert us.shape == (2, 4, 16)
    assert np.array_equal(np.asarray(us[:, 2]), np.asarray(ss[:, 1]))
    assert np.array_equal(np.asarray(us[:, 3]), np.asarray(ss[:, 1]))


@pytest.mark.parametrize("lengths", [[9, 16], [1, 5]])
def test_fp_packed_parity(rng, lengths):
    B, H, S, D = 2, 4, 16, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray(lengths, jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = A.decode_attention_fused(
        A.pack_heads_rows(q), _pack_cache(k), _pack_cache(v), length,
        interpret=True, packed=True,
    )
    assert got.shape == (B, H // 2, 2 * D)
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


def test_fp_packed_stacked(rng):
    L, B, H, S, D = 3, 2, 4, 16, 64
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.float32)
    length = jnp.asarray([7, 12], jnp.int32)
    for layer in (0, 2):
        want = ops.decode_attention(q, k[layer], v[layer], length)
        got = A.decode_attention_fused(
            A.pack_heads_rows(q), _pack_cache(k), _pack_cache(v), length,
            interpret=True, layer=jnp.int32(layer), packed=True,
        )
        np.testing.assert_allclose(
            np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
            rtol=1e-5, atol=1e-5,
        )


def test_quant_packed_parity(rng):
    B, H, S, D = 2, 4, 16, 64
    q, kf, vf = _mk(rng, B, H, S, D)
    kq, ks, kq_h, ks_h = _quant_pair_cache(kf)
    vq, vs, vq_h, vs_h = _quant_pair_cache(vf)
    length = jnp.asarray([10, 16], jnp.int32)
    # Reference: the SAME per-pair quantized values viewed per head.
    want = ops.decode_attention_quant(q, kq_h, ks_h, vq_h, vs_h, length)
    got = A.decode_attention_quant_fused(
        A.pack_heads_rows(q), kq, ks, vq, vs,
        length, interpret=True, packed=True,
    )
    # Same quantized values on both sides, but the jnp reference runs
    # bf16-operand einsums vs the kernel's f32 — an O(1e-3) band, not exact.
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=2e-2, atol=5e-3,
    )
    # And the per-pair quantization itself stays within the usual INT8
    # band of the float reference.
    base = ops.decode_attention(q, kf, vf, length)
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(base),
        rtol=5e-2, atol=5e-2,
    )


class TestPackedDeferred:
    def test_fp_deferred_matches_appended(self, rng):
        B, H, S, D = 2, 4, 16, 64
        q, k, v = _mk(rng, B, H, S, D)
        k_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        pos = jnp.asarray([5, 11], jnp.int32)

        def put(c, r):
            return jax.vmap(
                lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                    cb, rb[:, None, :], pb, axis=1)
            )(c, r, pos)

        want = ops.decode_attention(q, put(k, k_new), put(v, v_new), pos + 1)
        got = A.decode_attention_deferred_fused(
            A.pack_heads_rows(q), A.pack_heads_rows(k_new),
            A.pack_heads_rows(v_new), _pack_cache(k), _pack_cache(v), pos,
            interpret=True, packed=True,
        )
        np.testing.assert_allclose(
            np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
            rtol=1e-5, atol=1e-5,
        )

    def test_quant_deferred_matches_appended(self, rng):
        B, H, S, D = 2, 4, 16, 64
        q, kf, vf = _mk(rng, B, H, S, D)
        kq, ks, kq_h, ks_h = _quant_pair_cache(kf)
        vq, vs, vq_h, vs_h = _quant_pair_cache(vf)
        knew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        vnew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        knq, kns, knq_h, kns_h = _quant_pair_rows(knew)
        vnq, vns, vnq_h, vns_h = _quant_pair_rows(vnew)
        pos = jnp.asarray([7, 13], jnp.int32)

        def put(c, r):
            return jax.vmap(
                lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                    cb, rb[:, None, :].astype(cb.dtype), pb, axis=1)
            )(c, r, pos)

        def puts(c, r):
            return jax.vmap(
                lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                    cb, rb[:, None], pb, axis=1)
            )(c, r, pos)

        want = ops.decode_attention_quant(
            q, put(kq_h, knq_h), puts(ks_h, kns_h),
            put(vq_h, vnq_h), puts(vs_h, vns_h), pos + 1,
        )
        got = A.decode_attention_quant_deferred_fused(
            A.pack_heads_rows(q), knq, kns, vnq, vns,
            kq, ks, vq, vs,
            pos, interpret=True, packed=True,
        )
        np.testing.assert_allclose(
            np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
            rtol=2e-2, atol=5e-3,
        )

    def test_empty_cache_self_only(self, rng):
        B, H, S, D = 1, 2, 8, 64
        q, k, v = _mk(rng, B, H, S, D)
        k_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        got = A.decode_attention_deferred_fused(
            A.pack_heads_rows(q), A.pack_heads_rows(k_new),
            A.pack_heads_rows(v_new), _pack_cache(k), _pack_cache(v),
            jnp.asarray([0], jnp.int32), interpret=True, packed=True,
        )
        np.testing.assert_allclose(
            np.asarray(A.unpack_heads_rows(got)), np.asarray(v_new),
            rtol=1e-6, atol=1e-6,
        )


def test_packed_multi_chunk(rng, monkeypatch):
    """Tiny block budget forces the scratch carry across S-chunks with the
    dual lo/hi softmax state."""
    monkeypatch.setattr(A, "_BLOCK_BUDGET", 512 * 1024)
    B, H, S, D = 1, 2, 600, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([517], jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = A.decode_attention_fused(
        A.pack_heads_rows(q), _pack_cache(k), _pack_cache(v), length,
        interpret=True, packed=True,
    )
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )

    kq, ks, kq_h, ks_h = _quant_pair_cache(k)
    vq, vs, vq_h, vs_h = _quant_pair_cache(v)
    want_q = ops.decode_attention_quant(q, kq_h, ks_h, vq_h, vs_h, length)
    got_q = A.decode_attention_quant_fused(
        A.pack_heads_rows(q), kq, ks, vq, vs,
        length, interpret=True, packed=True,
    )
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got_q)), np.asarray(want_q),
        rtol=2e-2, atol=5e-3,
    )


def test_packed_batch_fold_deferred_quant(rng, monkeypatch):
    """bc > 1 (sub-batch loop) through the packed deferred INT8 path."""
    monkeypatch.setenv("ZG2_ATTN_FOLD_MAX", "8")
    B, H, S, D = 4, 4, 32, 64
    q, kf, vf = _mk(rng, B, H, S, D)
    kq, ks, kq_h, ks_h = _quant_pair_cache(kf)
    vq, vs, vq_h, vs_h = _quant_pair_cache(vf)
    knew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    vnew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    knq, kns, knq_h, kns_h = _quant_pair_rows(knew)
    vnq, vns, vnq_h, vns_h = _quant_pair_rows(vnew)
    pos = jnp.asarray([0, 3, 31, 17], jnp.int32)

    def put(c, r):
        return jax.vmap(
            lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                cb, rb[:, None, :].astype(cb.dtype), pb, axis=1)
        )(c, r, pos)

    def puts(c, r):
        return jax.vmap(
            lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                cb, rb[:, None], pb, axis=1)
        )(c, r, pos)

    want = ops.decode_attention_quant(
        q, put(kq_h, knq_h), puts(ks_h, kns_h),
        put(vq_h, vnq_h), puts(vs_h, vns_h), pos + 1
    )
    got = A.decode_attention_quant_deferred_fused(
        A.pack_heads_rows(q), knq, kns, vnq, vns,
        kq, ks, vq, vs,
        pos, interpret=True, packed=True,
    )
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=2e-2, atol=5e-3,
    )

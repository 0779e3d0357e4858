"""Head-pair-PACKED decode-attention kernel parity (interpret mode).

The packed layout stores two heads per 128-lane row (caches (…, Hp, S, 2D),
scale planes (…, 2, Hp, S) half-grouped) so the kernel's 3-D VPU passes run
at full lane occupancy — see ops/attention._build_kernel_packed. Every test
builds UNPACKED data, packs it with the layout helpers, and checks the
packed kernel against the jnp reference on the unpacked view.
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


def test_layout_helpers_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((3, 6, 64)), jnp.float32)
    assert np.array_equal(A.unpack_heads_rows(A.pack_heads_rows(x)), x)
    c = jnp.asarray(rng.standard_normal((2, 4, 16, 64)), jnp.float32)
    p = A.pack_heads_seq(c)
    assert p.shape == (2, 2, 16, 128)
    # lane halves hold adjacent heads
    assert np.array_equal(np.asarray(p[:, 1, :, :64]), np.asarray(c[:, 2]))
    assert np.array_equal(np.asarray(p[:, 1, :, 64:]), np.asarray(c[:, 3]))
    s = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    g = A.pack_head_scales(s)
    assert g.shape == (2, 2, 2)
    assert np.array_equal(np.asarray(g[:, 0]), np.asarray(s[:, 0::2]))
    assert np.array_equal(np.asarray(g[:, 1]), np.asarray(s[:, 1::2]))
    ss = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    gs = A.pack_head_scales_seq(ss)
    assert gs.shape == (2, 2, 2, 16)
    assert np.array_equal(np.asarray(gs[:, 0]), np.asarray(ss[:, 0::2]))


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
    kq, ks = ops.quantize_kv(kf)
    vq, vs = ops.quantize_kv(vf)
    length = jnp.asarray([10, 16], jnp.int32)
    want = ops.decode_attention_quant(q, kq, ks, vq, vs, length)
    got = A.decode_attention_quant_fused(
        A.pack_heads_rows(q), _pack_cache(kq),
        A.pack_head_scales_seq(ks),  # (B, H, S) -> (B, 2, Hp, S)
        _pack_cache(vq), A.pack_head_scales_seq(vs),
        length, interpret=True, packed=True,
    )
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=2e-2, atol=2e-3,
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
        kq, ks = ops.quantize_kv(kf)
        vq, vs = ops.quantize_kv(vf)
        knew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        vnew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        knq, kns = ops.quantize_kv(knew)
        vnq, vns = ops.quantize_kv(vnew)
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
            q, put(kq, knq), puts(ks, kns), put(vq, vnq), puts(vs, vns),
            pos + 1,
        )
        got = A.decode_attention_quant_deferred_fused(
            A.pack_heads_rows(q), A.pack_heads_rows(knq),
            A.pack_head_scales(kns), A.pack_heads_rows(vnq),
            A.pack_head_scales(vns),
            _pack_cache(kq), A.pack_head_scales_seq(ks),
            _pack_cache(vq), A.pack_head_scales_seq(vs),
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

    kq, ks = ops.quantize_kv(k)
    vq, vs = ops.quantize_kv(v)
    want_q = ops.decode_attention_quant(q, kq, ks, vq, vs, length)
    got_q = A.decode_attention_quant_fused(
        A.pack_heads_rows(q), _pack_cache(kq),
        A.pack_head_scales_seq(ks),
        _pack_cache(vq), A.pack_head_scales_seq(vs),
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
    kq, ks = ops.quantize_kv(kf)
    vq, vs = ops.quantize_kv(vf)
    knew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    vnew = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    knq, kns = ops.quantize_kv(knew)
    vnq, vns = ops.quantize_kv(vnew)
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
        q, put(kq, knq), puts(ks, kns), put(vq, vnq), puts(vs, vns), pos + 1
    )
    got = A.decode_attention_quant_deferred_fused(
        A.pack_heads_rows(q), A.pack_heads_rows(knq), A.pack_head_scales(kns),
        A.pack_heads_rows(vnq), A.pack_head_scales(vns),
        _pack_cache(kq), A.pack_head_scales_seq(ks),
        _pack_cache(vq), A.pack_head_scales_seq(vs),
        pos, interpret=True, packed=True,
    )
    np.testing.assert_allclose(
        np.asarray(A.unpack_heads_rows(got)), np.asarray(want),
        rtol=2e-2, atol=5e-3,
    )

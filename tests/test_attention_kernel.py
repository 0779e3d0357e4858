"""Fused decode-attention Pallas kernel parity vs the jnp reference
(interpret mode on CPU; the real lowering is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.ops import attention as fused
from zig_gpt2_tpu.ops import layers as ops


def _mk(rng, b, h, s, d, dtype=np.float32):
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32).astype(dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32).astype(dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32).astype(dtype)
    return q, k, v


@pytest.mark.parametrize("lengths", [[9, 16], [1, 5]])
def test_fp_parity(rng, lengths):
    B, H, S, D = 2, 4, 16, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray(lengths, jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = fused.decode_attention_fused(q, k, v, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fp_scalar_length(rng):
    B, H, S, D = 1, 2, 8, 64
    q, k, v = _mk(rng, B, H, S, D)
    want = ops.decode_attention(q, k, v, jnp.int32(5))
    got = fused.decode_attention_fused(q, k, v, jnp.int32(5), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_quant_parity(rng):
    B, H, S, D = 2, 3, 16, 64
    q, kf, vf = _mk(rng, B, H, S, D)
    kq, ks = ops.quantize_kv(kf)
    vq, vs = ops.quantize_kv(vf)
    length = jnp.asarray([10, 16], jnp.int32)
    want = ops.decode_attention_quant(q, kq, ks, vq, vs, length)
    got = fused.decode_attention_quant_fused(
        q, kq, ks, vq, vs, length, interpret=True
    )
    # Same math, same bf16 operand dots; only reduction order may differ.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3)


def test_garbage_beyond_length_ignored(rng):
    """Rows >= length must not leak into the output (mask inside kernel)."""
    B, H, S, D = 1, 2, 8, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([4], jnp.int32)
    base = fused.decode_attention_fused(q, k, v, length, interpret=True)
    k2 = k.at[:, :, 4:].set(1e9)
    v2 = v.at[:, :, 4:].set(-1e9)
    got = fused.decode_attention_fused(q, k2, v2, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-6)


def test_bf16_io(rng):
    B, H, S, D = 2, 2, 16, 64
    q, k, v = _mk(rng, B, H, S, D, dtype=jnp.bfloat16)
    length = jnp.asarray([7, 12], jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = fused.decode_attention_fused(q, k, v, length, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


class TestDeferredAppend:
    """Deferred-append attention (old cache + self-term) must equal
    append-then-attend over length+1 rows."""

    def test_fp_deferred_matches_appended(self, rng):
        B, H, S, D = 2, 4, 16, 64
        q, k, v = _mk(rng, B, H, S, D)
        k_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        pos = jnp.asarray([5, 11], jnp.int32)
        # Oracle: write the row, attend over pos+1 rows.
        def put(c, r):
            return jax.vmap(
                lambda cb, rb, pb: jax.lax.dynamic_update_slice_in_dim(
                    cb, rb[:, None, :], pb, axis=1)
            )(c, r, pos)
        want = ops.decode_attention(q, put(k, k_new), put(v, v_new), pos + 1)
        got = fused.decode_attention_deferred_fused(
            q, k_new, v_new, k, v, pos, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_quant_deferred_matches_appended(self, rng):
        B, H, S, D = 2, 3, 16, 64
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
            q, put(kq, knq), puts(ks, kns), put(vq, vnq), puts(vs, vns), pos + 1
        )
        got = fused.decode_attention_quant_deferred_fused(
            q, knq, kns, vnq, vns, kq, ks, vq, vs, pos, interpret=True
        )
        # Oracle uses bf16-operand einsums, kernel pure f32 — small noise.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=5e-3)

    def test_empty_cache_self_only(self, rng):
        """pos=0: output must be exactly v_new (softmax over one element)."""
        B, H, S, D = 1, 2, 8, 64
        q, k, v = _mk(rng, B, H, S, D)
        k_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        got = fused.decode_attention_deferred_fused(
            q, k_new, v_new, k, v, jnp.asarray([0], jnp.int32), interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(v_new),
                                   rtol=1e-6, atol=1e-6)


def test_multi_chunk_online_softmax(rng, monkeypatch):
    """A tiny block budget forces several S-chunk grid steps, exercising the
    online-softmax scratch carry across the chunk grid dimension."""
    # 128-row chunks: per_row = h*128*4*4 = 4 KiB -> sc = 128, 5 chunks.
    monkeypatch.setattr(fused, "_BLOCK_BUDGET", 512 * 1024)
    B, H, S, D = 1, 2, 600, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([517], jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = fused.decode_attention_fused(q, k, v, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    kq, ks = ops.quantize_kv(k)
    vq, vs = ops.quantize_kv(v)
    want_q = ops.decode_attention_quant(q, kq, ks, vq, vs, length)
    got_q = fused.decode_attention_quant_fused(q, kq, ks, vq, vs, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q), rtol=2e-2, atol=5e-3)


def test_batch_fold_multi_chunk(rng, monkeypatch):
    """bc > 1 (several sequences per grid cell) combined with S-chunking:
    per-sequence lengths must mask independently inside the folded cell.
    Folding is capped at bc=2 in production (ZG2_ATTN_FOLD_MAX); this keeps the
    machinery correct for a future pre-merged plane layout."""
    monkeypatch.setattr(fused, "_BLOCK_BUDGET", 1024 * 1024)
    monkeypatch.setenv("ZG2_ATTN_FOLD_MAX", "8")
    B, H, S, D = 4, 2, 300, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([1, 37, 300, 129], jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = fused.decode_attention_fused(q, k, v, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_batch_fold_deferred_quant(rng, monkeypatch):
    """bc > 1 on the deferred INT8 path (the serving configuration)."""
    monkeypatch.setenv("ZG2_ATTN_FOLD_MAX", "8")
    B, H, S, D = 4, 3, 32, 64
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
    got = fused.decode_attention_quant_deferred_fused(
        q, knq, kns, vnq, vns, kq, ks, vq, vs, pos, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=5e-3)


class TestPickBlockLaneLegality:
    """Mosaic requires the quant scale-plane block's LANE dim (sc) to be a
    128-multiple or exactly S. Interpret mode never checks this — the
    batcher's S = max_seq + chunk - 1 = 207 crashed on hardware — so pin
    the invariant for a sweep of S values here."""

    def test_quant_sc_lane_legal(self):
        from zig_gpt2_tpu.ops.attention import _pick_block

        for s in (64, 192, 207, 255, 256, 513, 640, 1024, 1031):
            for b, h in ((1, 12), (16, 25), (8, 20)):
                bc, sc, n_chunks = _pick_block(b, h, s, 1, quant=True,
                                               foldable=True)
                assert sc % 128 == 0 or sc == s, (s, b, h, sc)
                assert n_chunks * sc >= s
                assert b % bc == 0

    def test_nonquant_sc_8_aligned(self):
        from zig_gpt2_tpu.ops.attention import _pick_block

        for s in (64, 192, 207, 640):
            bc, sc, n_chunks = _pick_block(4, 12, s, 2, quant=False,
                                           foldable=True)
            assert sc % 8 == 0
            assert n_chunks * sc >= s

    def test_mc_fold_packed_default(self, monkeypatch):
        """Multi-chunk bc>1 defaults ON for the PACKED layout only (its
        halved temporaries measured clean at +16.5% on v5e, 1.5B B=16
        ctx 1152 — BENCHMARKS.md round 4); unpacked keeps the proven-OOM
        default off. ZG2_ATTN_MC_FOLD forces either way."""
        from zig_gpt2_tpu.ops.attention import _pick_block

        monkeypatch.delenv("ZG2_ATTN_MC_FOLD", raising=False)
        # 1.5B-ish INT8 cache at ctx 1152: multi-chunk territory.
        s, b = 1152, 16
        bc_u, _, nc_u = _pick_block(b, 25, s, 1, quant=True, foldable=True)
        bc_p, _, nc_p = _pick_block(b, 13, s, 1, quant=True, foldable=True,
                                    packed=True)
        if nc_u > 1:
            assert bc_u == 1, (bc_u, nc_u)
        if nc_p > 1:
            assert bc_p > 1, (bc_p, nc_p)
        monkeypatch.setenv("ZG2_ATTN_MC_FOLD", "0")
        bc_off, _, nc_off = _pick_block(b, 13, s, 1, quant=True,
                                        foldable=True, packed=True)
        if nc_off > 1:
            assert bc_off == 1, (bc_off, nc_off)

    def test_packed_quant_single_chunk_cap(self, monkeypatch):
        """Packed quant single-chunk is capped at hp*sc <= 13*768: the v5e
        scoped-VMEM sweep (tools/ab/vmem_sweep.py) compiled sc=768 and
        OOMed sc>=896 at hp=13 — S=1031 (the engine's context-size default
        shape, the ab_packed crash) must go multi-chunk."""
        from zig_gpt2_tpu.ops.attention import _pick_block

        monkeypatch.delenv("ZG2_ATTN_MC_FOLD", raising=False)
        for s in (1031, 896, 1152):
            bc, sc, nc = _pick_block(16, 13, s, 1, quant=True, foldable=True,
                                     packed=True)
            assert nc > 1, (s, bc, sc, nc)
            assert bc * 13 * sc <= 13 * 768 or bc == 1, (s, bc, sc)
        # ...and small shapes keep the proven single-chunk fast path.
        bc, sc, nc = _pick_block(16, 13, 199, 1, quant=True, foldable=True,
                                 packed=True)
        assert nc == 1 and sc <= 768

    def test_batcher_headroom_shape_interpret(self, rng):
        """S=207 (the crashing hardware shape) through the full quant
        deferred kernel in interpret mode."""
        import jax.numpy as jnp
        import numpy as np

        from zig_gpt2_tpu.ops import attention as A
        from zig_gpt2_tpu.ops import layers as ops

        L, B, H, S, D = 2, 4, 5, 207, 16
        kc = jnp.asarray(rng.integers(-127, 127, (L, B, H, S, D)), jnp.int8)
        vc = jnp.asarray(rng.integers(-127, 127, (L, B, H, S, D)), jnp.int8)
        ks = jnp.asarray(rng.random((L, B, H, S)), jnp.float32) * 0.01
        vs = jnp.asarray(rng.random((L, B, H, S)), jnp.float32) * 0.01
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        knq, ksn = ops.quantize_kv(
            jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32))
        vnq, vsn = ops.quantize_kv(
            jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32))
        pos = jnp.asarray([10, 100, 200, 206], jnp.int32)
        out = np.asarray(A.decode_attention_quant_deferred_fused(
            q, knq, ksn, vnq, vsn, kc, ks, vc, vs, pos,
            layer=jnp.int32(1), interpret=True,
        ))
        assert np.isfinite(out).all() and out.shape == (B, H, D)

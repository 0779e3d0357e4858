"""Quantization tests: scheme round-trip, fused-matmul parity (jnp + Pallas
interpret mode), INT8 KV-cache attention, and quantized end-to-end decode.

The reference has no quantization; the oracle here is the framework's own
FP32 path (the PPL gates vs FP32 are checked by the eval harness; these tests
pin the *mechanics* — packing, scales, kernel math — exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, GPTConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.ops import layers as ops
from zig_gpt2_tpu.quant import kernels, quantize as q


def _rand_w(rng, k, n):
    return jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05


class TestScheme:
    def test_int8_roundtrip_error(self, rng):
        w = _rand_w(rng, 256, 128)
        qp = q.quantize_linear({"w": w, "b": None}, "int8")
        wd = q.dequantize_linear(qp)["w"]
        # Symmetric absmax INT8: error bounded by scale/2 per element.
        groups = qp["scale"].shape[-2]
        scale_full = jnp.repeat(qp["scale"], 256 // groups, axis=0)
        assert jnp.max(jnp.abs(wd - w) / scale_full) <= 0.5 + 1e-6

    def test_int4_pack_unpack_exact(self, rng):
        w = _rand_w(rng, 256, 128)
        qp = q.quantize_linear({"w": w, "b": None}, "int4")
        assert qp["qw4"].shape == (128, 128) and qp["qw4"].dtype == jnp.int8
        unpacked = q.unpack_int4(qp["qw4"])
        assert unpacked.shape == (256, 128)
        assert int(jnp.max(unpacked)) <= 7 and int(jnp.min(unpacked)) >= -7
        # Re-pack must reproduce the packed bytes exactly.
        lo, hi = jnp.split(unpacked, 2, axis=-2)
        repacked = ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(repacked), np.asarray(qp["qw4"]))

    def test_group_size_selection(self):
        assert q.pick_group_size(768, "int8") == 128
        assert q.pick_group_size(1600, "int8") == 64
        assert q.pick_group_size(1600, "int4") == 32  # K/2=800 needs 32
        assert q.pick_group_size(6400, "int4") == 128  # 3200 % 128 == 0

    def test_zero_column_padding_safe(self, rng):
        """TP head padding produces all-zero weight columns — scales must
        stay finite and the quantized column must stay exactly zero."""
        w = _rand_w(rng, 128, 64).at[:, -16:].set(0.0)
        qp = q.quantize_linear({"w": w, "b": None}, "int8")
        assert bool(jnp.isfinite(qp["scale"]).all())
        wd = q.dequantize_linear(qp)["w"]
        np.testing.assert_array_equal(np.asarray(wd[:, -16:]), 0.0)

    def test_leading_layer_axis(self, rng):
        """Block weights carry a leading L axis through quantization."""
        w = jnp.asarray(rng.standard_normal((3, 128, 64), dtype=np.float32))
        qp = q.quantize_linear({"w": w, "b": None}, "int4")
        assert qp["qw4"].shape == (3, 64, 64)
        assert qp["scale"].shape[0] == 3
        wd = q.dequantize_linear(qp)["w"]
        assert wd.shape == w.shape


class TestMatmulParity:
    @pytest.mark.parametrize("mode", ["int8", "int4"])
    def test_quantized_linear_matches_dequant(self, rng, mode):
        """quantized_linear (grouped partial dots, f32 scales on partials)
        must equal dequantize-then-matmul to float32 roundoff."""
        w = _rand_w(rng, 256, 192)
        b = jnp.asarray(rng.standard_normal(192, dtype=np.float32))
        x = jnp.asarray(rng.standard_normal((4, 256), dtype=np.float32))
        qp = q.quantize_linear({"w": w, "b": b}, mode)
        got = q.quantized_linear(qp, x)
        want = ops.linear(x, q.dequantize_linear(qp)["w"], b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("mode", ["int8", "int4"])
    @pytest.mark.parametrize("n", [256, 150])  # 150: N % block_n != 0
    def test_pallas_kernel_interpret(self, rng, mode, n):
        """The Pallas qmm kernel (interpret mode on CPU) dequantizes in f32
        then takes one dot — for f32 activations it must match dequantize-
        then-matmul to f32 roundoff."""
        w = _rand_w(rng, 256, n)
        x = jnp.asarray(rng.standard_normal((8, 256), dtype=np.float32))
        qp = q.quantize_linear({"w": w, "b": None}, mode)
        packed = qp.get("qw", qp.get("qw4"))
        got = kernels.qmm(
            x, packed, qp["scale"], int4=(mode == "int4"),
            block_n=128, interpret=True,
        )
        want = x @ q.dequantize_linear(qp)["w"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_large_batch_path(self, rng):
        """rows > GEMV_MAX_ROWS takes the dequant+GEMM path; still matches."""
        w = _rand_w(rng, 128, 64)
        x = jnp.asarray(rng.standard_normal((300, 128), dtype=np.float32))
        qp = q.quantize_linear({"w": w, "b": None}, "int8")
        got = q.quantized_linear(qp, x)
        want = x @ q.dequantize_linear(qp)["w"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("mode", ["int8", "int4"])
    @pytest.mark.parametrize("rows", [65, 128, 256])
    def test_pallas_kernel_wide_rows(self, rng, mode, rows):
        """The lifted GEMV row cap (GEMV_MAX_ROWS=256, VERDICT r04 item 4):
        the kernel takes rows > 64 with the activation block budgeted in
        the auto block_n pick — parity at the old bound's edge and the new
        cap, default tiling (block_n=0 exercises the chooser)."""
        assert kernels.GEMV_MAX_ROWS == 256
        w = _rand_w(rng, 256, 384)
        x = jnp.asarray(rng.standard_normal((rows, 256), dtype=np.float32))
        qp = q.quantize_linear({"w": w, "b": None}, mode)
        packed = qp.get("qw", qp.get("qw4"))
        got = kernels.qmm(x, packed, qp["scale"], int4=(mode == "int4"),
                          interpret=True)
        want = x @ q.dequantize_linear(qp)["w"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("rows", [65, 256])
    def test_pallas_kernel_wide_rows_stacked(self, rng, rows):
        """Wide rows through the STACKED (scan) qmm variant."""
        L = 2
        w = jnp.asarray(rng.standard_normal((L, 256, 384), dtype=np.float32))
        x = jnp.asarray(rng.standard_normal((rows, 256), dtype=np.float32))
        qp = q.quantize_linear({"w": w, "b": None}, "int4")
        for layer in range(L):
            got = kernels.qmm(x, qp["qw4"], qp["scale"], int4=True,
                              layer=jnp.int32(layer), interpret=True)
            want = x @ q.dequantize_linear(qp)["w"][layer]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("rows", [65, 256])
    def test_wmm_wide_rows(self, rng, rows):
        w = jnp.asarray(rng.standard_normal((256, 384), dtype=np.float32))
        x = jnp.asarray(rng.standard_normal((rows, 256), dtype=np.float32))
        got = kernels.wmm(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                                   rtol=2e-5, atol=2e-5)


class TestKVCacheInt8:
    def test_quantize_kv_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 32), dtype=np.float32))
        qv, scale = ops.quantize_kv(x)
        assert qv.dtype == jnp.int8 and scale.shape == (2, 4)
        err = jnp.abs(qv.astype(jnp.float32) * scale[..., None] - x)
        assert float(jnp.max(err / scale[..., None])) <= 0.5 + 1e-6

    def test_decode_attention_quant_close_to_fp(self, rng):
        B, H, S, D = 2, 4, 16, 32
        qh = jnp.asarray(rng.standard_normal((B, H, D), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, S, D), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, S, D), dtype=np.float32))
        length = jnp.asarray([9, 16], jnp.int32)
        want = ops.decode_attention(qh, k, v, length)
        kq, ks = ops.quantize_kv(k)
        vq, vs = ops.quantize_kv(v)
        got = ops.decode_attention_quant(qh, kq, ks, vq, vs, length)
        # INT8 KV error ~0.4% relative; bf16 operand dots add a little more.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0.05, atol=0.02)

    def test_masked_rows_ignored(self, rng):
        """Garbage (never-written) cache rows beyond `length` must not
        affect the output — the length mask, not the stored zeros, is load-
        bearing."""
        B, H, S, D = 1, 2, 8, 16
        qh = jnp.asarray(rng.standard_normal((B, H, D), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, S, D), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, S, D), dtype=np.float32))
        kq, ks = ops.quantize_kv(k)
        vq, vs = ops.quantize_kv(v)
        length = jnp.asarray([5], jnp.int32)
        base = ops.decode_attention_quant(qh, kq, ks, vq, vs, length)
        kq2 = kq.at[:, :, 5:].set(127)
        ks2 = ks.at[:, :, 5:].set(1e9)
        got = ops.decode_attention_quant(qh, kq2, ks2, vq, vs, length)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-6)


class TestEndToEnd:
    @pytest.mark.parametrize("mode", ["int8", "int4"])
    def test_quantized_model_decodes(self, rng, mode):
        """Quantized params + INT8 KV cache run prefill + decode and produce
        logits close (argmax-stable on a peaked distribution) to FP32."""
        config = GPT2_NANO
        params = gpt2.init_params(config, jax.random.PRNGKey(0))
        qparams = q.quantize_params(params, mode=mode)
        tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 12)), jnp.int32)
        lengths = jnp.asarray([12, 7], jnp.int32)

        cache = gpt2.init_kv_cache(config, 2, 32)
        cache_fp, logits_fp = gpt2.prefill(params, cache, tokens, lengths, config)

        qcache = gpt2.init_kv_cache(config, 2, 32, quant="int8")
        qcache, logits_q = gpt2.prefill(qparams, qcache, tokens, lengths, config)
        assert qcache["k"].dtype == jnp.int8
        # Correlation between FP32 and quantized logits should be very high.
        a = np.asarray(logits_fp, np.float64)
        b = np.asarray(logits_q, np.float64)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > (0.995 if mode == "int8" else 0.95), corr

        # A full decode step must run and stay finite.
        next_tok = jnp.argmax(logits_q, -1).astype(jnp.int32)
        qcache, logits2 = gpt2.decode_step(qparams, qcache, next_tok, config)
        assert np.isfinite(np.asarray(logits2, np.float32)).all()
        np.testing.assert_array_equal(np.asarray(qcache["length"]), [13, 8])

    def test_quantize_params_structure(self):
        config = GPTConfig(vocab_size=256, context_size=32, n_layers=2, n_heads=2, n_embed=64)
        params = gpt2.init_params(config, jax.random.PRNGKey(1))
        qp = q.quantize_params(params, mode="int4")
        assert "qw4" in qp["blocks"]["mlp"]["c_fc"]
        assert "qw" in qp["lm_head"]  # lm_head stays INT8 at INT4 mode
        assert qp["blocks"]["ln_1"] is params["blocks"]["ln_1"]  # LN untouched
        assert qp["wte"] is params["wte"]  # embedding gather stays float


class TestCheckpointRepack:
    def test_npz_roundtrip_and_repack_tool(self, tmp_path, rng):
        """raw fp32 -> repack tool -> npz -> load == quantize_params direct."""
        import jax

        from zig_gpt2_tpu.config import GPTConfig
        from zig_gpt2_tpu.utils import io as zio

        config = GPTConfig(vocab_size=256, context_size=32, n_layers=2,
                           n_heads=2, n_embed=64)
        params = gpt2.init_params(config, jax.random.PRNGKey(2))
        raw = tmp_path / "raw"
        zio.save_gpt2_raw(params, raw, config)

        # (the repack CLI resolves named configs; exercise its pieces
        # directly for this ad-hoc tiny config)
        out = tmp_path / "int4.npz"
        loaded = zio.load_gpt2_raw(raw, config)
        qdirect = q.quantize_params(loaded, mode="int4")
        zio.save_pytree_npz(qdirect, out)
        qloaded = zio.load_pytree_npz(out)

        flat_a = jax.tree_util.tree_leaves_with_path(qdirect)
        flat_b = jax.tree_util.tree_leaves_with_path(qloaded)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                      sorted(flat_b, key=lambda t: str(t[0]))):
            assert str(pa) == str(pb)
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

        # The loaded checkpoint must actually run.
        tokens = jnp.asarray(rng.integers(0, 256, (1, 8)), jnp.int32)
        logits = gpt2.forward(qloaded, tokens, config)
        assert np.isfinite(np.asarray(logits, np.float32)).all()


class TestW8A8:
    def test_w8a8_matmul_matches_reference(self, rng):
        """s8×s8 path == quantize-x-then-dequant-matmul, exactly (int32
        accumulation is exact; only activation rounding differs from the
        weight-only path)."""
        k, n, b = 256, 128, 4
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * 0.02
        p = q.quantize_linear({"w": w, "b": None}, "int8")  # per-channel
        assert p["scale"].shape == (1, n)
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
        got = np.asarray(q.w8a8_matmul(x, p["qw"], p["scale"]))
        xq, sx = q.quantize_rows(x)
        want = (
            np.asarray(xq, np.int64) @ np.asarray(p["qw"], np.int64)
        ).astype(np.float64) * np.asarray(sx)[:, None] * np.asarray(p["scale"][0])[None, :]
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)

    def test_w8a8_error_small(self, rng):
        k, n = 512, 256
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * 0.02
        p = q.quantize_linear({"w": w, "b": None}, "int8")
        x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
        exact = np.asarray(x @ w)
        got = np.asarray(q.w8a8_matmul(x, p["qw"], p["scale"]))
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        assert rel < 0.02, rel  # int8 weights + int8 activations

    def test_quantized_linear_act_quant_dispatch(self, rng):
        p = q.quantize_linear(
            {"w": jnp.asarray(rng.standard_normal((256, 128)), jnp.float32),
             "b": None}, "int8")
        x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
        y_aq = np.asarray(q.quantized_linear(p, x, act_quant=True))
        y_ref = np.asarray(q.w8a8_matmul(x, p["qw"], p["scale"]))
        np.testing.assert_allclose(y_aq, y_ref, rtol=1e-6)
        # grouped layout ignores act_quant (falls through to weight-only)
        pg = q.quantize_linear(
            {"w": jnp.asarray(rng.standard_normal((256, 128)), jnp.float32),
             "b": None}, "int8", group_size=64)
        y_g = np.asarray(q.quantized_linear(pg, x, act_quant=True))
        y_g0 = np.asarray(q.quantized_linear(pg, x, act_quant=False))
        np.testing.assert_array_equal(y_g, y_g0)

    def test_kernel_w8a8_interpret_matches_jnp(self, rng):
        from zig_gpt2_tpu.quant import kernels

        k, n = 256, 384
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * 0.02
        p = q.quantize_linear({"w": w, "b": None}, "int8")
        x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
        got = np.asarray(kernels.qmm(x, p["qw"], p["scale"], w8a8=True,
                                     interpret=True))
        want = np.asarray(q.w8a8_matmul(x, p["qw"], p["scale"]))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_model_decode_with_act_quant(self, rng):
        """Full decode step with config.act_quant on CPU (jnp w8a8 path)."""
        import dataclasses

        from zig_gpt2_tpu.config import GPT2_NANO
        from zig_gpt2_tpu.models import gpt2

        cfg = dataclasses.replace(GPT2_NANO, act_quant=True)
        params = q.quantize_params(
            gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0)), mode="int8")
        cache = gpt2.init_kv_cache(cfg, 2, 16)
        cache["length"] = jnp.asarray([3, 5], jnp.int32)
        cache, logits = gpt2.decode_step(
            params, cache, jnp.asarray([1, 2], jnp.int32), cfg)
        assert np.isfinite(np.asarray(logits, np.float32)).all()


class TestWmm:
    """Float-weight stacked GEMV kernel (quant/kernels.wmm): the bf16
    decode-GEMV MXU path replacing XLA's VPU multiply-reduce fusions."""

    @pytest.mark.parametrize("n", [256, 150])  # 150: N % block_n != 0
    def test_kernel_interpret_matches_dot(self, rng, n):
        w = jnp.asarray(rng.standard_normal((128, n), dtype=np.float32))
        x = jnp.asarray(rng.standard_normal((4, 128), dtype=np.float32))
        got = kernels.wmm(x, w, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                                   rtol=2e-5, atol=2e-5)

    def test_stacked_layer_select(self, rng):
        """Stacked (L, K, N) weights with the layer chosen via scalar
        prefetch must match slicing the layer first."""
        ws = jnp.asarray(rng.standard_normal((3, 64, 256), dtype=np.float32))
        x = jnp.asarray(rng.standard_normal((2, 64), dtype=np.float32))
        for l in range(3):
            got = kernels.wmm(x, ws, layer=jnp.int32(l), block_n=128,
                              interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(x @ ws[l]), rtol=2e-5, atol=2e-5
            )

    def test_model_decode_wmm_matches_jnp(self, rng):
        """ZG2_WMM=interpret routes the float decode linears through the
        kernel — greedy decode must match the jnp path exactly (f32)."""
        import os

        from zig_gpt2_tpu.config import GPT2_NANO
        from zig_gpt2_tpu.models import gpt2

        params = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(2))
        tok = jnp.asarray([3], jnp.int32)

        def one_step():
            cache = gpt2.init_kv_cache(GPT2_NANO, 1, 16)
            cache["length"] = jnp.asarray([2], jnp.int32)
            return gpt2.decode_step(params, cache, tok, GPT2_NANO)[1]

        want = np.asarray(one_step())
        os.environ["ZG2_WMM"] = "interpret"
        try:
            got = np.asarray(one_step())
        finally:
            del os.environ["ZG2_WMM"]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

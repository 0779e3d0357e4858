"""Per-shard Pallas kernels under shard_map — interpret-mode parity on the
8-device CPU mesh (VERDICT round-1 item 2).

Every wrapper must equal its unsharded reference exactly (same kernel math,
just partitioned), and the full decode step with ZG2_SPMD_KERNELS=interpret
must generate the same greedy tokens as the jnp SPMD path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.ops import layers as ops
from zig_gpt2_tpu.parallel import mesh as pmesh
from zig_gpt2_tpu.parallel import shard_kernels as sk
from zig_gpt2_tpu.parallel import sharding as psh
from zig_gpt2_tpu.quant import quantize as q
from tests.tolerance import assert_logits_close, assert_tensors_close

DP, TP = 2, 4
B, H, D, S = 4, 8, 16, 32
E = H * D  # 128


@pytest.fixture(scope="module")
def mesh():
    return pmesh.make_mesh(DP, TP)


class TestQmmSharded:
    @pytest.mark.parametrize("role", ["col", "row"])
    @pytest.mark.parametrize("mode", ["int8", "int4"])
    def test_matches_dequant_matmul(self, mesh, rng, role, mode):
        k, n = 128, 256
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
        g = q.pick_group_size(k, mode, tp=TP if role == "row" else 1)
        p = q.quantize_linear({"w": w, "b": None}, mode, group_size=g,
                              tp=TP if role == "row" else 1)
        x = jnp.asarray(rng.standard_normal((B, k)), jnp.float32)
        want = np.asarray(x @ q.dequantize_linear(p)["w"])
        qw = p.get("qw", p.get("qw4"))
        got = np.asarray(sk.qmm_sharded(
            x, qw, p["scale"], int4=mode == "int4", role=role, mesh=mesh,
            interpret=True,
        ))
        assert_tensors_close(got, want, abs_tol=1e-5, msg=f"{role}/{mode}")

    @pytest.mark.parametrize("role", ["col", "row"])
    @pytest.mark.parametrize("mode", ["int8", "int4"])
    def test_stacked_matches(self, mesh, rng, role, mode):
        L, k, n = 3, 128, 256
        w = jnp.asarray(rng.standard_normal((L, k, n)), jnp.float32)
        tp = TP if role == "row" else 1
        p = q.quantize_linear({"w": w, "b": None}, mode,
                              group_size=q.pick_group_size(k, mode, tp=tp),
                              tp=tp)
        x = jnp.asarray(rng.standard_normal((B, k)), jnp.float32)
        qw = p.get("qw", p.get("qw4"))
        wf = q.dequantize_linear(p)["w"]
        for layer in (0, L - 1):
            want = np.asarray(x @ wf[layer])
            got = np.asarray(sk.qmm_sharded(
                x, qw, p["scale"], int4=mode == "int4", role=role,
                mesh=mesh, layer=jnp.int32(layer), interpret=True,
            ))
            assert_tensors_close(got, want, abs_tol=1e-5,
                                 msg=f"stacked {role}/{mode} L{layer}")


class TestAttentionSharded:
    def _setup(self, rng, quant):
        L = 2
        kc = rng.standard_normal((L, B, H, S, D)).astype(np.float32)
        vc = rng.standard_normal((L, B, H, S, D)).astype(np.float32)
        qv = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        pos = jnp.asarray(rng.integers(1, S - 1, B), jnp.int32)
        if not quant:
            return qv, kn, vn, jnp.asarray(kc), jnp.asarray(vc), pos
        kq, ks = ops.quantize_kv(jnp.asarray(kc))
        vq, vs = ops.quantize_kv(jnp.asarray(vc))
        knq, ksn = ops.quantize_kv(kn)
        vnq, vsn = ops.quantize_kv(vn)
        return qv, knq, ksn, vnq, vsn, kq, ks, vq, vs, pos

    def test_float_matches_reference(self, mesh, rng):
        qv, kn, vn, kc, vc, pos, = self._setup(rng, quant=False)
        layer = jnp.int32(1)
        got = np.asarray(sk.decode_attention_deferred_sharded(
            qv, kn, vn, kc, vc, pos, layer, mesh=mesh, interpret=True,
        ))
        # Reference: append to row pos, then plain jnp decode attention.
        kc2 = gpt2._put_row_stacked(kc, kn, layer, pos)
        vc2 = gpt2._put_row_stacked(vc, vn, layer, pos)
        want = np.asarray(ops.decode_attention(qv, kc2[1], vc2[1], pos + 1))
        assert_logits_close(got, want, msg="sharded deferred attention")

    def test_quant_matches_unsharded_kernel(self, mesh, rng):
        """Sharding must not change the kernel's math: sharded output ==
        the SAME kernel run unsharded (both interpret). (The jnp reference
        uses bf16 dots, so kernel-vs-jnp legitimately differs at ~1e-3 —
        covered with that tolerance in tests/test_attention_kernel.py.)"""
        from zig_gpt2_tpu.ops import attention as fused

        (qv, knq, ksn, vnq, vsn, kq, ks, vq, vs, pos) = self._setup(
            rng, quant=True)
        layer = jnp.int32(0)
        got = np.asarray(sk.decode_attention_quant_deferred_sharded(
            qv, knq, ksn, vnq, vsn, kq, ks, vq, vs, pos, layer,
            mesh=mesh, interpret=True,
        ))
        want = np.asarray(fused.decode_attention_quant_deferred_fused(
            qv, knq, ksn, vnq, vsn, kq, ks, vq, vs, pos,
            layer=layer, interpret=True,
        ))
        np.testing.assert_array_equal(got, want)


class TestEndToEndShardedDecode:
    """decode_step with the shard_map kernel path (interpret mode) must
    produce the same logits as the jnp GSPMD path, INT4 weights + INT8
    cache included — proving dispatch wiring, not just the wrappers."""

    CFG = GPTConfig(vocab_size=512, context_size=64, n_layers=2,
                    n_heads=8, n_embed=128)

    def _run(self, monkeypatch, mesh, kernels: bool):
        monkeypatch.setenv("ZG2_SPMD_KERNELS", "interpret" if kernels else "0")
        tp = mesh.shape[pmesh.MODEL_AXIS]
        params = gpt2.init_params(self.CFG, jax.random.PRNGKey(0))
        params, cfg = psh.pad_for_tp(params, self.CFG, tp)
        # Fixed group size: auto-picked groups depend on tp, and the mesh-
        # invariance test needs identical quantized values across meshes.
        params = q.quantize_params(params, mode="int4", tp=tp, group_size=8)
        cfg = dataclasses.replace(cfg, mesh=mesh)
        params = jax.device_put(
            params, pmesh.param_shardings(mesh, cfg, params))
        cache = jax.device_put(
            gpt2.init_kv_cache(cfg, B, 16, quant="int8"),
            pmesh.cache_shardings(mesh, cfg, quant="int8"),
        )
        tokens = jnp.asarray(
            np.random.default_rng(1).integers(0, 500, (B, 4)), jnp.int32)
        lengths = jnp.full((B,), 4, jnp.int32)
        cache, logits = jax.jit(
            lambda p, c, t, l: gpt2.prefill(p, c, t, l, cfg)
        )(params, cache, tokens, lengths)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        outs = [np.asarray(logits)]
        step = jax.jit(lambda p, c, t: gpt2.decode_step(p, c, t, cfg))
        for _ in range(3):
            cache, logits = step(params, cache, tok)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            outs.append(np.asarray(logits))
        return outs

    def test_sharded_kernels_match_jnp_path(self, monkeypatch, mesh):
        base = self._run(monkeypatch, mesh, kernels=False)
        kern = self._run(monkeypatch, mesh, kernels=True)
        for i, (a, b) in enumerate(zip(base, kern)):
            # The kernel path does its attention dots in f32 where the jnp
            # path uses bf16 — logits agree to bf16 precision, and greedy
            # decisions must be identical.
            assert_logits_close(b, a, atol=0.02, rtol=0.02,
                                msg=f"sharded decode step {i}")
            np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))

    def test_mesh_shape_invariance(self, monkeypatch):
        """With kernels on, 2x4 and 1x8 meshes must produce identical
        logits (pure partitioning invariance of the kernel path)."""
        a = self._run(monkeypatch, pmesh.make_mesh(2, 4), kernels=True)
        b = self._run(monkeypatch, pmesh.make_mesh(1, 8), kernels=True)
        for i, (x, y) in enumerate(zip(a, b)):
            assert_logits_close(y, x, msg=f"mesh invariance step {i}")

    def test_dispatch_enabled(self, monkeypatch, mesh):
        monkeypatch.setenv("ZG2_SPMD_KERNELS", "interpret")
        cfg = dataclasses.replace(self.CFG, spmd=True, mesh=mesh)
        assert gpt2._use_sharded_kernels(cfg)
        monkeypatch.setenv("ZG2_SPMD_KERNELS", "0")
        assert not gpt2._use_sharded_kernels(cfg)
        # No mesh -> never.
        assert not gpt2._use_sharded_kernels(
            dataclasses.replace(self.CFG, spmd=True))

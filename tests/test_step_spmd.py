"""Step-level shard_map decode (parallel/step_spmd): the whole decode+sample
chunk as ONE manual-SPMD region must reproduce the single-device engine
exactly, on the virtual 8-device CPU mesh (ZG2_STEP_SPMD=1 forces the path
on CPU; the body then runs the jnp op fallbacks — the manual collectives
are identical to the TPU program's)."""

import dataclasses

import jax
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import InferenceEngine

CFG = GPT2_NANO


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(CFG, jax.random.PRNGKey(7))


@pytest.fixture
def step_spmd_on(monkeypatch):
    monkeypatch.setenv("ZG2_STEP_SPMD", "1")


def _mesh(dp, tp):
    from zig_gpt2_tpu.parallel import mesh as pmesh

    return pmesh.make_mesh(dp, tp)


def test_enabled_dispatch(params, step_spmd_on):
    from zig_gpt2_tpu.parallel import mesh as pmesh, step_spmd

    assert not step_spmd.enabled(CFG)  # no mesh
    _, cfg = pmesh.prepare_params(params, CFG, _mesh(1, 8))
    assert step_spmd.enabled(cfg)
    lc = step_spmd.local_config(cfg)
    assert lc.manual_axis == "model" and not lc.spmd and lc.mesh is None
    assert lc.attn_heads == cfg.attn_heads // 8


def test_greedy_parity_tp8(params, step_spmd_on):
    base = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,))
    ids = [9, 8, 7, 6]
    want = base.generate(ids, 10, SamplingConfig(temperature=0.0))

    eng = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                          mesh=_mesh(1, 8))
    got = eng.generate(ids, 10, SamplingConfig(temperature=0.0))
    assert got == want


def test_greedy_parity_dp2_tp4_batched(params, step_spmd_on):
    """dp×tp mesh through the fully-on-device scan path (generate_scan),
    batch sharded over data."""
    base = InferenceEngine(CFG, params, batch_size=4, max_seq=32,
                           prompt_buckets=(8,))
    prompts = np.zeros((4, 8), np.int32)
    prompts[:, :3] = [[1, 2, 3], [4, 5, 6], [7, 8, 9], [2, 4, 6]]
    lengths = [3, 3, 3, 3]
    s = SamplingConfig(temperature=0.0)
    want = base.generate_scan(prompts, lengths, 6, s)

    eng = InferenceEngine(CFG, params, batch_size=4, max_seq=32,
                          prompt_buckets=(8,), mesh=_mesh(2, 4))
    got = eng.generate_scan(prompts, lengths, 6, s)
    np.testing.assert_array_equal(got, want)


def test_greedy_parity_dp_only_mesh(params, step_spmd_on):
    """tp=1, dp=8 (ADVICE round-2 medium): the manual axis has size 1;
    batch rides the data axis."""
    base = InferenceEngine(CFG, params, batch_size=8, max_seq=32,
                           prompt_buckets=(8,))
    prompts = np.tile(np.asarray([[3, 1, 4, 1, 5]], np.int32), (8, 1))
    prompts = np.pad(prompts, ((0, 0), (0, 3)))
    lengths = [5] * 8
    s = SamplingConfig(temperature=0.0)
    want = base.generate_scan(prompts, lengths, 5, s)

    eng = InferenceEngine(CFG, params, batch_size=8, max_seq=32,
                          prompt_buckets=(8,), mesh=_mesh(8, 1))
    got = eng.generate_scan(prompts, lengths, 5, s)
    np.testing.assert_array_equal(got, want)


def test_greedy_parity_quantized_int4_kv8(params, step_spmd_on):
    """INT4 weights (the nibble-sliced row-parallel path + replicated
    grouped scales) + INT8 KV cache under the step-level mesh."""
    from zig_gpt2_tpu.parallel import mesh as pmesh
    from zig_gpt2_tpu.parallel import sharding as psh
    from zig_gpt2_tpu.quant import quantize as q

    padded, cfg = psh.pad_for_tp(params, CFG, 8)
    qparams = q.quantize_params(padded, mode="int4", group_size=16, tp=8)
    base = InferenceEngine(
        dataclasses.replace(cfg, spmd=False), qparams, max_seq=32,
        prompt_buckets=(8,), kv_quant="int8",
    )
    ids = [4, 3, 2, 1]
    want = base.generate(ids, 8, SamplingConfig(temperature=0.0))

    mesh = _mesh(1, 8)
    sharded = jax.device_put(
        qparams, pmesh.param_shardings(mesh, cfg, qparams)
    )
    eng = InferenceEngine(cfg, sharded, max_seq=32, prompt_buckets=(8,),
                          kv_quant="int8", mesh=mesh)
    got = eng.generate(ids, 8, SamplingConfig(temperature=0.0))
    assert got == want


def test_greedy_parity_quantized_int8(params, step_spmd_on):
    """Per-channel INT8 weights (the direct K-sharded row path)."""
    from zig_gpt2_tpu.parallel import mesh as pmesh
    from zig_gpt2_tpu.parallel import sharding as psh
    from zig_gpt2_tpu.quant import quantize as q

    padded, cfg = psh.pad_for_tp(params, CFG, 8)
    qparams = q.quantize_params(padded, mode="int8", tp=8)
    base = InferenceEngine(
        dataclasses.replace(cfg, spmd=False), qparams, max_seq=32,
        prompt_buckets=(8,),
    )
    ids = [2, 7, 1, 8]
    want = base.generate(ids, 8, SamplingConfig(temperature=0.0))

    mesh = _mesh(1, 8)
    sharded = jax.device_put(
        qparams, pmesh.param_shardings(mesh, cfg, qparams)
    )
    eng = InferenceEngine(cfg, sharded, max_seq=32, prompt_buckets=(8,),
                          mesh=mesh)
    got = eng.generate(ids, 8, SamplingConfig(temperature=0.0))
    assert got == want


def test_sampled_reproducible_and_chunked(params, step_spmd_on):
    """Temperature sampling under the step path is deterministic per seed,
    and the chunked streaming loop (decode_chunk>1) yields the same visible
    tokens as the per-token loop."""
    mesh = _mesh(1, 8)
    eng = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                          mesh=mesh, decode_chunk=1)
    s = SamplingConfig(temperature=0.8, seed=11)
    out = eng.generate([1, 2, 3], 8, s)
    assert len(out) == 8
    assert eng.generate([1, 2, 3], 8, s) == out

    chunked = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                              mesh=mesh, decode_chunk=4)
    assert chunked.generate([1, 2, 3], 8, s) == out
    want = eng.generate([5, 5], 9, SamplingConfig(temperature=0.0))
    assert chunked.generate([5, 5], 9, SamplingConfig(temperature=0.0)) == want


PACK_CFG = GPTConfig(vocab_size=512, context_size=128, n_layers=2,
                     n_heads=4, n_embed=256)  # head_dim 64 -> packable


def _mesh2():
    from zig_gpt2_tpu.parallel import mesh as pmesh

    return pmesh.make_mesh(1, 2, devices=jax.devices()[:2])


def test_greedy_parity_packed_mesh(step_spmd_on, monkeypatch):
    """Head-pair-packed KV cache under the step-level mesh (D=64, even
    per-shard head count): the packed fused kernels run per shard in
    interpret mode inside the manual body, token-identical to the meshless
    packed engine."""
    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")
    p = gpt2.init_params(PACK_CFG, jax.random.PRNGKey(3))
    base = InferenceEngine(PACK_CFG, p, max_seq=32, prompt_buckets=(8,))
    assert base.config.kv_packed
    want = base.generate([7, 3, 5], 8, SamplingConfig(temperature=0.0))

    eng = InferenceEngine(PACK_CFG, p, max_seq=32, prompt_buckets=(8,),
                          mesh=_mesh2())
    assert eng.config.kv_packed  # H/tp = 2 even -> packed stays on
    got = eng.generate([7, 3, 5], 8, SamplingConfig(temperature=0.0))
    assert got == want


def test_greedy_parity_packed_mesh_kv8(step_spmd_on, monkeypatch):
    """Packed + INT8 KV cache under the mesh: the (L, B, 2, H/2, S) scale
    planes shard the pair axis (cache_pspecs packed spec). Forced via
    ZG2_KV_PACKED=1 — the round-4 default keeps quant caches UNPACKED
    (ab_packed measured 0.945x at 1.5B B=16), but the layout must stay
    correct for the A/B knob."""
    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")
    monkeypatch.setenv("ZG2_KV_PACKED", "1")
    p = gpt2.init_params(PACK_CFG, jax.random.PRNGKey(4))
    base = InferenceEngine(PACK_CFG, p, max_seq=32, prompt_buckets=(8,),
                           kv_quant="int8")
    assert base.config.kv_packed
    want = base.generate([2, 9, 4], 8, SamplingConfig(temperature=0.0))

    eng = InferenceEngine(PACK_CFG, p, max_seq=32, prompt_buckets=(8,),
                          kv_quant="int8", mesh=_mesh2())
    assert eng.config.kv_packed
    got = eng.generate([2, 9, 4], 8, SamplingConfig(temperature=0.0))
    assert got == want


def test_packed_disabled_for_odd_local_heads(step_spmd_on, monkeypatch):
    """H/tp odd (4 heads over tp=4) -> pairs would straddle shards; the
    engine must fall back to the unpacked layout and still be correct."""
    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")
    from zig_gpt2_tpu.parallel import mesh as pmesh

    p = gpt2.init_params(PACK_CFG, jax.random.PRNGKey(5))
    base = InferenceEngine(PACK_CFG, p, max_seq=32, prompt_buckets=(8,))
    want = base.generate([1, 2, 3], 6, SamplingConfig(temperature=0.0))

    mesh = pmesh.make_mesh(1, 4, devices=jax.devices()[:4])
    eng = InferenceEngine(PACK_CFG, p, max_seq=32, prompt_buckets=(8,),
                          mesh=mesh)
    assert not eng.config.kv_packed
    got = eng.generate([1, 2, 3], 6, SamplingConfig(temperature=0.0))
    assert got == want


def test_batcher_step_spmd_parity(params, step_spmd_on):
    """ContinuousBatcher's chunked decode through the step-level region
    (emit_consumed convention) on a 2×4 mesh matches the meshless batcher."""
    from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

    def run(mesh):
        b = ContinuousBatcher(
            CFG, params, batch_size=2, max_seq=32, prompt_buckets=(8,),
            sampling=SamplingConfig(temperature=0.0), decode_chunk=2,
            mesh=mesh,
        )
        for ids in ([1, 2, 3], [4, 5], [6, 7, 8, 9]):
            b.submit(ids, max_new_tokens=5)
        return {r.rid: r.generated for r in b.run()}

    assert run(_mesh(2, 4)) == run(None)


def test_step_pspecs_int4_scale_replicated(params):
    from jax.sharding import PartitionSpec as P

    from zig_gpt2_tpu.parallel import sharding as psh, step_spmd
    from zig_gpt2_tpu.quant import quantize as q

    padded, cfg = psh.pad_for_tp(params, CFG, 8)
    qparams = q.quantize_params(padded, mode="int4", group_size=16, tp=8)
    cfg = dataclasses.replace(cfg, mesh=_mesh(1, 8))
    pp = step_spmd.step_param_pspecs(cfg, qparams)
    assert pp["blocks"]["mlp"]["c_proj"]["scale"] == P(None, None, None)
    assert pp["blocks"]["attn"]["c_proj"]["scale"] == P(None, None, None)
    # Column-parallel scales stay N-sharded.
    assert pp["blocks"]["mlp"]["c_fc"]["scale"] == P(None, None, "model")


def test_sampled_dp_rows_decorrelated(params, step_spmd_on):
    """Regression: under dp>1 the replicated key must be folded with the
    data-axis index — without it two data shards holding IDENTICAL prompts
    draw byte-identical noise and decode in lockstep."""
    prompts = np.zeros((2, 8), np.int32)
    prompts[:, :3] = [1, 2, 3]  # identical rows -> identical logits
    eng = InferenceEngine(CFG, params, batch_size=2, max_seq=32,
                          prompt_buckets=(8,), mesh=_mesh(2, 4))
    out = eng.generate_scan(prompts, [3, 3], 12,
                            SamplingConfig(temperature=1.2, seed=5))
    assert not np.array_equal(out[0], out[1]), out

"""gpt2.extend over the head-pair-packed KV-cache layout (round 4).

The packed layout (config.kv_packed) previously asserted out of the extend
path, which forced the speculative engine to give up packed decode for the
draft model. Extend now packs the window on append and attends over
unpacked views; these tests pin parity against the unpacked path through a
mixed prefill -> decode -> extend -> decode flow (the speculative draft's
actual call pattern), plus the end-to-end SpeculativeEngine greedy stream
with ZG2_SPEC_DRAFT_PACKED=1.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from tests.tolerance import assert_logits_close

CFG_EVEN = GPTConfig(vocab_size=256, context_size=64, n_layers=2,
                     n_heads=2, n_embed=128)
# 3 heads * 64 head_dim — the zero-phantom-head (1.5B 25-head) case.
CFG_ODD = GPTConfig(vocab_size=256, context_size=64, n_layers=2,
                    n_heads=3, n_embed=192)


def _flow(config, kv_quant, seed=3):
    """prefill -> decode -> ragged 3-token extend -> decode; returns the
    logits at every stage (extend rows past ``valid`` are garbage by
    contract and are masked to zero before comparison)."""
    params = gpt2.init_params(config, jax.random.PRNGKey(0))
    cache = gpt2.init_kv_cache(config, batch_size=2, max_seq=32,
                               quant=kv_quant)
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 8)),
                         jnp.int32)
    lengths = jnp.asarray([5, 8], jnp.int32)
    cache, logits = gpt2.prefill(params, cache, tokens, lengths, config)
    outs = [logits]
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    cache, logits = gpt2.decode_step(params, cache, tok, config)
    outs.append(logits)

    win = jnp.asarray(rng.integers(0, config.vocab_size, (2, 3)), jnp.int32)
    valid = jnp.asarray([3, 2], jnp.int32)
    cache, elogits = gpt2.extend(params, cache, win, valid, config)
    row_ok = (jnp.arange(3)[None, :] < valid[:, None])[..., None]
    outs.append(jnp.where(row_ok, elogits, 0.0))

    # Decode after the extend: reads the window rows back out of the cache
    # (and lane 1's append overwrites its garbage padding row).
    tok2 = jnp.argmax(elogits[:, 0], -1).astype(jnp.int32)
    cache, logits = gpt2.decode_step(params, cache, tok2, config)
    outs.append(logits)
    return [np.asarray(x, np.float32) for x in outs]


@pytest.mark.parametrize("cfg", [CFG_EVEN, CFG_ODD], ids=["even", "odd"])
@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_packed_extend_matches_unpacked(cfg, kv_quant, monkeypatch):
    base = _flow(cfg, kv_quant)
    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")
    got = _flow(dataclasses.replace(cfg, kv_packed=True), kv_quant)
    for name, b, g in zip(("prefill", "decode", "extend", "decode2"),
                          base, got):
        if kv_quant == "int8":
            # Same bf16-einsum-vs-f32-kernel tolerance as
            # test_model_packed.test_packed_decode_matches_unpacked.
            np.testing.assert_allclose(g, b, rtol=2e-2, atol=5e-3,
                                       err_msg=name)
        else:
            assert_logits_close(g, b, msg=f"packed extend: {name}")


@pytest.mark.parametrize("cfg", [CFG_EVEN, CFG_ODD], ids=["even", "odd"])
def test_packed_extend_jnp_fallback(cfg):
    """kv_packed with the fused decode kernels OFF (pure jnp everywhere)
    must still match — isolates the extend pack/unpack from the kernels."""
    base = _flow(cfg, None)
    got = _flow(dataclasses.replace(cfg, kv_packed=True), None)
    for name, b, g in zip(("prefill", "decode", "extend", "decode2"),
                          base, got):
        assert_logits_close(g, b, msg=f"packed extend jnp: {name}")


@pytest.mark.parametrize("draft_kv", [None, "int8"])
def test_speculative_packed_draft_greedy_parity(monkeypatch, draft_kv):
    """End to end: ZG2_SPEC_DRAFT_PACKED=1 (packed draft cache, fused
    kernels in interpret mode) reproduces the unpacked engine's exact
    greedy stream — the speculative correctness contract is layout-
    independent."""
    from zig_gpt2_tpu.runtime.engine import InferenceEngine
    from zig_gpt2_tpu.runtime.speculative import SpeculativeEngine

    tcfg = GPTConfig(vocab_size=512, context_size=128, n_layers=2,
                     n_heads=4, n_embed=256)  # D=64
    dcfg = GPTConfig(vocab_size=512, context_size=128, n_layers=1,
                     n_heads=2, n_embed=128)  # D=64 -> packable draft
    scale = 3.0  # diversify greedy streams (see test_speculative._params)
    tparams = jax.tree.map(
        lambda x: x * scale,
        gpt2.init_params(tcfg, jax.random.PRNGKey(0), jnp.float32))
    dparams = jax.tree.map(
        lambda x: x * scale,
        gpt2.init_params(dcfg, jax.random.PRNGKey(1), jnp.float32))
    B, P, S = 2, 8, 16
    prompts = np.random.default_rng(0).integers(
        0, tcfg.vocab_size, (B, P)).astype(np.int32)
    lens = [P, 5]
    eng = InferenceEngine(tcfg, tparams, batch_size=B, max_seq=64,
                          prompt_buckets=(P,))
    ref = eng.generate_scan(prompts, lens, S, SamplingConfig(temperature=0.0))

    monkeypatch.setenv("ZG2_SPEC_DRAFT_PACKED", "1")
    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")
    spec = SpeculativeEngine(tcfg, tparams, dcfg, dparams, k=3, batch_size=B,
                             max_seq=64, prompt_buckets=(P,),
                             draft_kv_quant=draft_kv)
    assert spec.draft_config.kv_packed, "packed draft opt-in did not apply"
    out = spec.generate_scan(prompts, lens, S,
                             SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(out, ref)

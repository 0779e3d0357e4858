"""End-to-end parity of the head-pair-packed KV-cache layout.

Runs prefill + several decode steps with config.kv_packed=True and the
fused kernels forced into interpret mode (ZG2_FUSED_ATTN=interpret), and
checks greedy tokens + logits against the plain unpacked jnp path. Covers
even head counts and the odd-head phantom pad (the 1.5B 25-head case).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.models import gpt2
from tests.tolerance import assert_logits_close

CFG_EVEN = GPTConfig(vocab_size=256, context_size=64, n_layers=2,
                     n_heads=2, n_embed=128)
# 3 heads * 64 head_dim — exercises the zero phantom head.
CFG_ODD = GPTConfig(vocab_size=256, context_size=64, n_layers=2,
                    n_heads=3, n_embed=192)


def _run(config, kv_quant, n_steps=6):
    params = gpt2.init_params(config, jax.random.PRNGKey(0))
    cache = gpt2.init_kv_cache(config, batch_size=2, max_seq=32,
                               quant=kv_quant)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 8)), jnp.int32)
    lengths = jnp.asarray([5, 8], jnp.int32)
    cache, logits = gpt2.prefill(params, cache, tokens, lengths, config)
    toks, all_logits = [], [logits]
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    for _ in range(n_steps):
        toks.append(np.asarray(tok))
        cache, logits = gpt2.decode_step(params, cache, tok, config)
        all_logits.append(logits)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return np.stack(toks), np.stack([np.asarray(x) for x in all_logits])


@pytest.mark.parametrize("cfg", [CFG_EVEN, CFG_ODD], ids=["even", "odd"])
@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_packed_decode_matches_unpacked(cfg, kv_quant, monkeypatch):
    base_toks, base_logits = _run(cfg, kv_quant)

    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")
    packed_cfg = dataclasses.replace(cfg, kv_packed=True)
    got_toks, got_logits = _run(packed_cfg, kv_quant)

    assert np.array_equal(got_toks, base_toks)
    if kv_quant == "int8":
        # The jnp INT8 reference path computes with bf16-operand einsums;
        # the kernel is pure f32 — same tolerance as the kernel parity
        # tests (test_attention_kernel.test_quant_parity).
        np.testing.assert_allclose(got_logits, base_logits,
                                   rtol=2e-2, atol=5e-3)
    else:
        assert_logits_close(got_logits, base_logits, msg="packed decode")


@pytest.mark.parametrize("cfg", [CFG_EVEN, CFG_ODD], ids=["even", "odd"])
def test_packed_jnp_fallback_matches(cfg):
    """kv_packed with the fused path OFF must still be correct (unpack
    views in the jnp reference path)."""
    base_toks, base_logits = _run(cfg, None)
    packed_cfg = dataclasses.replace(cfg, kv_packed=True)
    got_toks, got_logits = _run(packed_cfg, None)
    assert np.array_equal(got_toks, base_toks)
    assert_logits_close(got_logits, base_logits, msg="packed jnp fallback")


def test_packed_cache_shapes():
    cfg = dataclasses.replace(CFG_ODD, kv_packed=True)
    cache = gpt2.init_kv_cache(cfg, batch_size=2, max_seq=16, quant="int8")
    assert cache["k"].shape == (2, 2, 2, 16, 128)  # (L, B, Hp=2, S, 2D)
    # Per-PAIR scales (round 5): (L, B, Hp, S) — half the plane bytes of
    # the unpacked per-head layout.
    assert cache["k_scale"].shape == (2, 2, 2, 16)


def test_default_layout_policy(monkeypatch):
    """Round-5 measured layout policy (default_kv_packed): packed for BOTH
    cache dtypes — float +12% (r04 ab_wmm grid), INT8 +7.4% under per-PAIR
    scales (r05 ab_packed_pair; the r04 per-head-scale loss at 0.945x is
    why the quant default was unpacked until r05) — env forces win either
    way."""
    monkeypatch.delenv("ZG2_KV_PACKED", raising=False)
    monkeypatch.setenv("ZG2_FUSED_ATTN", "interpret")  # fused "active" on CPU
    assert gpt2.default_kv_packed(CFG_EVEN)
    assert gpt2.default_kv_packed(CFG_EVEN, "int8")
    monkeypatch.setenv("ZG2_KV_PACKED", "0")
    assert not gpt2.default_kv_packed(CFG_EVEN)
    assert not gpt2.default_kv_packed(CFG_EVEN, "int8")

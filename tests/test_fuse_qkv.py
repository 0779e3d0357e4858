"""Fused QKV projection (models.gpt2.fuse_qkv_params, ZG2_FUSE_QKV).

One (E, 3A) weight stream per layer instead of three (E, A) dispatches —
the reference's packed c_attn GEMM (ops.zig:143) recovered for the
single-device runtime. Each output column of the fused dot is the same
contraction as in the split dots, so results must match to roundoff and
greedy streams exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import InferenceEngine

GREEDY = SamplingConfig(temperature=0.0, seed=0)


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))


def test_fused_leaf_shapes(params):
    fused = gpt2.fuse_qkv_params(params)
    attn = fused["blocks"]["attn"]
    assert "wq" not in attn and "wqkv" in attn
    L, E = GPT2_NANO.n_layers, GPT2_NANO.n_embed
    A = GPT2_NANO.attn_heads * GPT2_NANO.head_dim
    assert attn["wqkv"]["w"].shape == (L, E, 3 * A)
    assert attn["wqkv"]["b"].shape == (L, 3 * A)
    assert gpt2.fuse_qkv_params(fused) is fused  # idempotent


def test_forward_matches_split(params, rng):
    toks = jnp.asarray(rng.integers(0, GPT2_NANO.vocab_size, (2, 9)))
    want = gpt2.forward(params, toks, GPT2_NANO)
    got = gpt2.forward(gpt2.fuse_qkv_params(params), toks, GPT2_NANO)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", [None, "int4"])
def test_engine_greedy_identity(params, rng, monkeypatch, quant):
    """End-to-end engine run (prefill + decode + extend-capable paths)
    with ZG2_FUSE_QKV=1 == the split-projection run, token for token."""
    p = params
    if quant:
        from zig_gpt2_tpu.quant import quantize as q

        p = q.quantize_params(params, mode=quant)
    prompt = list(rng.integers(0, GPT2_NANO.vocab_size, 7))

    def run(fused):
        monkeypatch.setenv("ZG2_FUSE_QKV", "1" if fused else "0")
        eng = InferenceEngine(GPT2_NANO, p, batch_size=1, max_seq=48,
                              prompt_buckets=(16,))
        if fused:
            assert "wqkv" in eng.params["blocks"]["attn"]
        return eng.generate(prompt, max_new_tokens=10, sampling=GREEDY)

    assert run(True) == run(False)

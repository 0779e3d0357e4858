"""InferenceEngine.register_prefix: single-stream prefix caching (the
library API for repeated generate() calls sharing a system prompt).
Oracle: greedy output bit-identical to the same engine without the
registration, across full hits, partial overlaps, prompt==prefix, misses,
per-token and chunked streaming."""

import jax
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import GenerationMetrics, InferenceEngine

GREEDY = SamplingConfig(temperature=0.0, seed=0)
PREFIX = [41, 7, 13, 29, 3, 17, 23, 11]


@pytest.fixture(scope="module")
def params():
    p = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
    return jax.tree.map(lambda x: x * 3.0, p)


def _engine(params, **kw):
    return InferenceEngine(GPT2_NANO, params, batch_size=1, max_seq=64,
                           prompt_buckets=(16,), **kw)


@pytest.mark.parametrize("decode_chunk", [1, 4])
@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_engine_prefix_greedy_parity(params, rng, decode_chunk, kv_quant):
    plain = _engine(params, decode_chunk=decode_chunk, kv_quant=kv_quant)
    cached = _engine(params, decode_chunk=decode_chunk, kv_quant=kv_quant)
    cached.register_prefix(PREFIX)
    prompts = [
        PREFIX + list(rng.integers(0, GPT2_NANO.vocab_size, 4)),  # hit
        list(PREFIX),                      # prompt == prefix (len-1 reuse)
        PREFIX[:5] + [9, 9],               # partial overlap
        list(rng.integers(0, GPT2_NANO.vocab_size, 5)),           # miss
    ]
    for p in prompts:
        m = GenerationMetrics()
        got = cached.generate(p, 8, GREEDY, metrics=m)
        want = plain.generate(p, 8, GREEDY)
        assert got == want, p
    # The engine is reusable after hits (stored cache never donated).
    assert cached.generate(prompts[0], 8, GREEDY) == plain.generate(
        prompts[0], 8, GREEDY)


def test_engine_prefix_metrics_and_validation(params, rng):
    eng = _engine(params)
    eng.register_prefix(PREFIX)
    m = GenerationMetrics()
    eng.generate(PREFIX + [5, 6], 4, GREEDY, metrics=m)
    assert m.prefix_tokens_reused == len(PREFIX)
    m2 = GenerationMetrics()
    eng.generate(list(rng.integers(0, GPT2_NANO.vocab_size, 4)), 4, GREEDY,
                 metrics=m2)
    assert m2.prefix_tokens_reused == 0
    with pytest.raises(ValueError):
        eng.register_prefix([])
    with pytest.raises(ValueError):
        eng.register_prefix(list(range(17)))  # > largest bucket
    eng2 = InferenceEngine(GPT2_NANO, params, batch_size=2, max_seq=64,
                           prompt_buckets=(16,))
    with pytest.raises(ValueError):
        eng2.register_prefix(PREFIX)

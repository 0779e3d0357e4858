"""Prefix caching in the continuous batcher (register_prefix): shared
system-prompt KV rows are spliced on admission and only the suffix is
computed (one B=1 extend). Output-parity oracle: greedy streams must be
bit-identical to the plain batcher with no prefix cache, through full
hits, partial overlaps, prompt==prefix, misses, slot reuse, and the
speculative serve mode."""

import jax
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

GREEDY = SamplingConfig(temperature=0.0, seed=0)
PREFIX = [41, 7, 13, 29, 3, 17, 23, 11]  # the "system prompt"


@pytest.fixture(scope="module")
def params():
    p = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
    return jax.tree.map(lambda x: x * 3.0, p)


def _serve(params, prompts, max_new, prefixes=(), **kw):
    b = ContinuousBatcher(GPT2_NANO, params, max_seq=64,
                          prompt_buckets=(16,), sampling=GREEDY, **kw)
    for pre in prefixes:
        b.register_prefix(pre)
    rids = [b.submit(p, max_new_tokens=max_new) for p in prompts]
    by = {r.rid: r.generated for r in b.run()}
    return [by[r] for r in rids], b.metrics


def _mixed_prompts(rng):
    return [
        PREFIX + list(rng.integers(0, GPT2_NANO.vocab_size, 4)),  # full hit
        PREFIX + [2],                                             # 1-suffix
        list(PREFIX),                                 # prompt == prefix
        PREFIX[:5] + [9, 9, 9],                       # partial overlap
        list(rng.integers(0, GPT2_NANO.vocab_size, 6)),           # miss
        PREFIX + list(rng.integers(0, GPT2_NANO.vocab_size, 7)),  # refill hit
    ]


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_prefix_cache_greedy_parity(params, rng, kv_quant):
    prompts = _mixed_prompts(rng)
    want, _ = _serve(params, prompts, 8, batch_size=2, kv_quant=kv_quant)
    got, m = _serve(params, prompts, 8, batch_size=2, kv_quant=kv_quant,
                    prefixes=[PREFIX])
    assert got == want
    # full hit (8-1... capped at len-1 only when prompt==prefix): hits are
    # the 5 prefix-sharing prompts; the miss admits through the grouped
    # prefill path.
    assert m.prefix_hits == 5
    # prompt==prefix reuses len-1 rows; the partial overlap reuses 5.
    assert m.prefill_tokens_saved == 8 + 8 + 7 + 5 + 8


def test_prefix_cache_spec_serve_parity(params, rng):
    """Prefix cache composes with speculative serving: the hist row is
    seeded with the FULL prompt on a prefix-hit admission."""
    prompts = _mixed_prompts(rng)
    want, _ = _serve(params, prompts, 8, batch_size=2)
    got, m = _serve(params, prompts, 8, batch_size=2, prefixes=[PREFIX],
                    speculative="ngram", spec_k=2, spec_chunk=2)
    assert got == want
    assert m.prefix_hits == 5 and m.spec_rounds > 0


def test_prefix_cache_mesh_parity(params, rng):
    """Prefix splices under a (1, 8) mesh (B=1 stored cache is
    model-sharded/data-replicated, like slot admissions)."""
    from zig_gpt2_tpu.parallel import mesh as pmesh

    prompts = _mixed_prompts(rng)[:4]
    want, _ = _serve(params, prompts, 6, batch_size=2)
    got, m = _serve(params, prompts, 6, batch_size=2, prefixes=[PREFIX],
                    mesh=pmesh.make_mesh(1, 8))
    assert got == want
    assert m.prefix_hits == 4


def test_longest_prefix_wins(params, rng):
    """Two registered prefixes where one extends the other: the longer
    match is chosen (more rows saved), same output."""
    long_pre = PREFIX + [5, 6]
    prompts = [long_pre + [1, 2], PREFIX + [9]]
    want, _ = _serve(params, prompts, 6, batch_size=2)
    got, m = _serve(params, prompts, 6, batch_size=2,
                    prefixes=[PREFIX, long_pre])
    assert got == want
    assert m.prefill_tokens_saved == 10 + 8


def test_register_prefix_validation(params):
    b = ContinuousBatcher(GPT2_NANO, params, batch_size=2, max_seq=64,
                          prompt_buckets=(16,), sampling=GREEDY)
    with pytest.raises(ValueError):
        b.register_prefix([])
    with pytest.raises(ValueError):
        b.register_prefix(list(range(17)))  # > largest bucket


def test_prefix_reuse_across_many_requests(params, rng):
    """The stored prefix cache must survive (not be donated into) every
    hit: 7 hits through 2 slots, all correct."""
    prompts = [PREFIX + [int(t)] for t in
               rng.integers(0, GPT2_NANO.vocab_size, 7)]
    want, _ = _serve(params, prompts, 5, batch_size=2)
    got, m = _serve(params, prompts, 5, batch_size=2, prefixes=[PREFIX])
    assert got == want
    assert m.prefix_hits == 7 and m.prefill_tokens_saved == 7 * 8

"""Continuous-batching scheduler tests.

Correctness oracle: greedy (temperature=0) decode is deterministic, so a
request streamed through the shared-slot batcher must produce exactly the
same tokens as the single-sequence InferenceEngine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher
from zig_gpt2_tpu.runtime.engine import InferenceEngine

GREEDY = SamplingConfig(temperature=0.0, seed=0)


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))


def _reference_outputs(params, prompts, max_new):
    engine = InferenceEngine(
        GPT2_NANO, params, batch_size=1, max_seq=64, prompt_buckets=(16,)
    )
    return [
        engine.generate(p, max_new_tokens=max_new, sampling=GREEDY)
        for p in prompts
    ]


def test_greedy_parity_with_slot_reuse(params, rng):
    """5 requests through 2 slots (forces slot reuse) == per-sequence greedy."""
    prompts = [
        list(rng.integers(0, GPT2_NANO.vocab_size, n)) for n in (3, 7, 5, 12, 9)
    ]
    want = _reference_outputs(params, prompts, max_new=8)

    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=2, max_seq=64,
        prompt_buckets=(16,), sampling=GREEDY,
    )
    rids = [batcher.submit(p, max_new_tokens=8) for p in prompts]
    done = batcher.run()
    assert len(done) == 5 and all(r.done for r in done)
    by_rid = {r.rid: r.generated for r in done}
    for rid, w in zip(rids, want):
        assert by_rid[rid] == w, f"request {rid} diverged"


def test_streaming_callback_and_interleaving(params, rng):
    """Tokens stream per step; two concurrent requests interleave."""
    events = []
    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=2, max_seq=64, prompt_buckets=(16,),
        sampling=GREEDY, on_token=lambda rid, tok: events.append((rid, tok)),
    )
    r0 = batcher.submit(list(rng.integers(0, 64, 4)), max_new_tokens=5)
    r1 = batcher.submit(list(rng.integers(0, 64, 4)), max_new_tokens=5)
    done = batcher.run()
    assert {r.rid for r in done} == {r0, r1}
    # Both requests' tokens appear, interleaved by steps (r0,r1,r0,r1,...).
    rids_in_order = [e[0] for e in events]
    assert rids_in_order[:4] == [r0, r1, r0, r1]
    for r in done:
        got = [t for rid, t in events if rid == r.rid]
        assert got == r.generated


def test_stop_token_not_emitted(params, rng):
    """A stop token retires the request without being emitted."""
    prompt = list(rng.integers(0, 64, 4))
    # Find what greedy generates first, then use it as the stop token.
    probe = ContinuousBatcher(
        GPT2_NANO, params, batch_size=1, max_seq=64, prompt_buckets=(16,),
        sampling=GREEDY,
    )
    probe.submit(prompt, max_new_tokens=3)
    first_tok = probe.run()[0].generated[0]

    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=1, max_seq=64, prompt_buckets=(16,),
        sampling=GREEDY,
    )
    batcher.submit(prompt, max_new_tokens=10, stop_tokens=[first_tok])
    done = batcher.run()
    assert done[0].generated == []  # stopped immediately, nothing emitted


def test_context_capacity_respected(params, rng):
    """A request near the context limit stops at max_seq, slot is recycled."""
    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=1, max_seq=24, prompt_buckets=(16,),
        sampling=GREEDY,
    )
    rid = batcher.submit(list(rng.integers(0, 64, 15)), max_new_tokens=None)
    done = batcher.run()
    assert len(done[0].generated) == 24 - 15
    # Slot must be reusable afterwards.
    rid2 = batcher.submit(list(rng.integers(0, 64, 3)), max_new_tokens=2)
    done2 = batcher.run()
    assert done2[0].rid == rid2 and len(done2[0].generated) == 2


def test_queue_longer_than_slots_all_complete(params, rng):
    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=3, max_seq=32, prompt_buckets=(16,),
        sampling=SamplingConfig(temperature=0.8, seed=1),
    )
    n_req = 10
    for _ in range(n_req):
        batcher.submit(list(rng.integers(0, 64, int(rng.integers(2, 10)))),
                       max_new_tokens=int(rng.integers(1, 6)))
    done = batcher.run()
    assert len(done) == n_req
    assert all(r.done and len(r.generated) >= 1 for r in done)
    assert batcher.pending == 0


def test_int8_kv_cache_batching(params, rng):
    """Continuous batching over the INT8 KV cache path: greedy tokens must
    match a single-sequence INT8-cache engine run per request (catches
    slot-splice layout bugs in the merged scale planes, not just crashes)."""
    from zig_gpt2_tpu.runtime.engine import InferenceEngine

    prompts = [list(rng.integers(0, 64, n)) for n in (5, 9, 3)]
    eng = InferenceEngine(GPT2_NANO, params, max_seq=32, prompt_buckets=(16,),
                          kv_quant="int8")
    want = [eng.generate(p, 4, GREEDY) for p in prompts]

    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=2, max_seq=32, prompt_buckets=(16,),
        sampling=GREEDY, kv_quant="int8",
    )
    assert batcher.cache["k"].dtype == jnp.int8
    rids = [batcher.submit(p, max_new_tokens=4) for p in prompts]
    done = {r.rid: r.generated for r in batcher.run()}
    assert [done[r] for r in rids] == want


class TestChunkedDecode:
    """decode_chunk > 1: greedy output must be identical to chunk=1."""

    @pytest.mark.parametrize("chunk", [2, 4])
    def test_greedy_parity_chunked(self, params, rng, chunk):
        prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
                   for n in (3, 7, 5)]
        want = _reference_outputs(params, prompts, max_new=7)

        batcher = ContinuousBatcher(
            GPT2_NANO, params, batch_size=2, max_seq=64,
            prompt_buckets=(16,), sampling=GREEDY, decode_chunk=chunk,
        )
        rids = [batcher.submit(p, max_new_tokens=7) for p in prompts]
        done = batcher.run()
        by_rid = {r.rid: r.generated for r in done}
        for rid, w in zip(rids, want):
            assert by_rid[rid] == w, f"request {rid} diverged (chunk={chunk})"

    def test_stop_token_mid_chunk(self, params, rng):
        prompt = list(rng.integers(0, 64, 4))
        probe = ContinuousBatcher(
            GPT2_NANO, params, batch_size=1, max_seq=64, prompt_buckets=(16,),
            sampling=GREEDY,
        )
        probe.submit(prompt, max_new_tokens=6)
        seq = probe.run()[0].generated
        stop = seq[2]  # stop on the 3rd greedy token (may repeat earlier)
        expected = seq[: seq.index(stop)]

        batcher = ContinuousBatcher(
            GPT2_NANO, params, batch_size=1, max_seq=64, prompt_buckets=(16,),
            sampling=GREEDY, decode_chunk=4,
        )
        batcher.submit(prompt, max_new_tokens=10, stop_tokens=[stop])
        done = batcher.run()
        assert done[0].generated == expected  # truncated mid-chunk, stop dropped


class TestGroupedAdmission:
    """Cold-start admissions are batched: one fused k-sequence prefill per
    bucket group (powers-of-two decomposition), not one dispatch per slot."""

    def test_cold_start_grouping_and_parity(self, params, rng):
        prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
                   for n in (3, 7, 5, 12, 9)]
        want = _reference_outputs(params, prompts, max_new=6)

        batcher = ContinuousBatcher(
            GPT2_NANO, params, batch_size=5, max_seq=64,
            prompt_buckets=(16,), sampling=GREEDY,
        )
        rids = [batcher.submit(p, max_new_tokens=6) for p in prompts]
        done = batcher.run()
        # 5 same-bucket slots admitted at once -> 4 + 1, two dispatches.
        assert set(batcher._prefill_inserts) == {4, 1}
        by_rid = {r.rid: r.generated for r in done}
        for rid, w in zip(rids, want):
            assert by_rid[rid] == w, f"request {rid} diverged"
        assert batcher.metrics.prefills == 5

    def test_mixed_buckets_group_separately(self, params, rng):
        short = [list(rng.integers(0, 64, 3)) for _ in range(2)]
        long = [list(rng.integers(0, 64, 20)) for _ in range(2)]
        prompts = [short[0], long[0], short[1], long[1]]
        want = {
            tuple(p): out for p, out in zip(
                prompts,
                [
                    InferenceEngine(
                        GPT2_NANO, params, batch_size=1, max_seq=64,
                        prompt_buckets=(8, 32),
                    ).generate(p, max_new_tokens=5, sampling=GREEDY)
                    for p in prompts
                ],
            )
        }
        batcher = ContinuousBatcher(
            GPT2_NANO, params, batch_size=4, max_seq=64,
            prompt_buckets=(8, 32), sampling=GREEDY,
        )
        rids = [batcher.submit(p, max_new_tokens=5) for p in prompts]
        done = {r.rid: r.generated for r in batcher.run()}
        # Two buckets x two requests -> two k=2 groups share one jit variant.
        assert set(batcher._prefill_inserts) == {2}
        for rid, p in zip(rids, prompts):
            assert done[rid] == want[tuple(p)], f"request {rid} diverged"

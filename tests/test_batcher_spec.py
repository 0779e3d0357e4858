"""Speculative serve mode: prompt-lookup (ngram) speculation inside the
continuous batcher (VERDICT r03 item 6).

Correctness oracle: the committed stream per request is EXACTLY what plain
greedy serving produces — on CPU the extend verify reproduces decode_step's
bits (the same contract test_speculative pins for the engine), so the spec
batcher must be token-identical to the normal batcher, through slot reuse,
stop tokens, and budgets. A repetition-loop prompt must also show
tokens_per_round > 1 (lookup really accepting)."""

import jax
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

GREEDY = SamplingConfig(temperature=0.0, seed=0)


@pytest.fixture(scope="module")
def params():
    # Scaled init diversifies greedy streams (see test_speculative._params).
    p = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
    return jax.tree.map(lambda x: x * 3.0, p)


def _serve(params, prompts, max_new, stop_tokens=(), **kw):
    b = ContinuousBatcher(GPT2_NANO, params, max_seq=64,
                          prompt_buckets=(16,), sampling=GREEDY, **kw)
    rids = [b.submit(p, max_new_tokens=max_new, stop_tokens=stop_tokens)
            for p in prompts]
    done = b.run()
    by_rid = {r.rid: r.generated for r in done}
    return [by_rid[r] for r in rids], b.metrics


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_spec_serve_greedy_parity_with_slot_reuse(params, rng, kv_quant):
    """5 requests through 2 slots: spec serve == plain serve, bit for bit
    (the INT8-KV variant is the flagship serving config)."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (3, 7, 5, 12, 9)]
    want, _ = _serve(params, prompts, 8, batch_size=2, kv_quant=kv_quant)
    got, m = _serve(params, prompts, 8, batch_size=2, kv_quant=kv_quant,
                    speculative="ngram", spec_k=3)
    assert got == want
    assert m.spec_rounds > 0 and m.spec_committed > 0
    # Latency observability (SURVEY §5): percentiles populated and ordered.
    assert m.sync_ms and m.sync_ms_percentile(50) > 0
    assert m.sync_ms_percentile(99) >= m.sync_ms_percentile(50)
    assert len(m.request_latency_s) == 5
    assert m.request_latency_percentile(99) >= m.request_latency_percentile(50) > 0


def test_spec_serve_wide_verify_window(params, rng):
    """batch_size*(spec_k+1) > 64 — the round-4 guard that refused this is
    gone (VERDICT r04 item 4, GEMV cap now 256): a 16-slot spec_k=4 serve
    (80-row verify extends) must still be token-identical to plain serve."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, 3 + n % 9))
               for n in range(20)]
    want, _ = _serve(params, prompts, 6, batch_size=16)
    got, m = _serve(params, prompts, 6, batch_size=16,
                    speculative="ngram", spec_k=4)
    assert got == want
    assert m.spec_rounds > 0


def test_spec_serve_stop_token_mid_round(params, rng):
    """A stop token inside a round's committed prefix retires the slot and
    discards the overshoot — visible output identical to plain serve."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, 6))
               for _ in range(3)]
    # Use each request's own 3rd greedy token as its stop token so the stop
    # genuinely fires mid-stream.
    base, _ = _serve(params, prompts, 12, batch_size=2)
    for p, w in zip(prompts, base):
        stop = w[2]
        want, _ = _serve(params, [p], 12, stop_tokens=(stop,), batch_size=2)
        got, _ = _serve(params, [p], 12, stop_tokens=(stop,), batch_size=2,
                        speculative="ngram", spec_k=3)
        assert got == want
        # Truncated exactly at the stop's FIRST occurrence (which may be
        # before index 2 if the stream repeats the token).
        assert got[0] == w[:w.index(stop)]


def test_spec_serve_accepts_on_repetition(params):
    """The ngram lookup must really accept on a looping stream:
    tokens_per_round > 1. Random weights may or may not settle into a
    repetition loop for any one prompt, so SEARCH a handful of seeded
    prompts for one whose plain greedy stream provably loops, then assert
    acceptance there — a regression that kills lookup acceptance (tpr
    pinned at 1.0) cannot slip through a vacuous guard."""
    looping = None
    for seed in range(8):
        r = np.random.default_rng(seed)
        prompt = list(r.integers(0, GPT2_NANO.vocab_size, 3)) * 5
        want, _ = _serve(params, [prompt], 24, batch_size=1)
        stream = want[0]
        if stream[-3:] == stream[-6:-3] == stream[-9:-6]:
            looping = (prompt, want)
            break
    assert looping is not None, (
        "no seeded prompt produced a looping greedy stream — pick new "
        "seeds so the acceptance assertion stays live")
    prompt, want = looping
    got, m = _serve(params, [prompt], 24, batch_size=1,
                    speculative="ngram", spec_k=3, spec_ngram=2)
    assert got == want
    assert 1.0 <= m.tokens_per_round <= 4.0
    assert m.tokens_per_round > 1.0, m.as_dict(1)


@pytest.mark.parametrize("spec_chunk", [2, 3])
def test_spec_serve_chunked_rounds_parity(params, rng, spec_chunk):
    """spec_chunk rounds per host sync: same committed streams as plain
    serve (stop/budget checks move to chunk granularity, overshoot is
    discarded — identical visible semantics to decode_chunk)."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (3, 7, 5, 12)]
    want, _ = _serve(params, prompts, 8, batch_size=2)
    got, m = _serve(params, prompts, 8, batch_size=2,
                    speculative="ngram", spec_k=2, spec_chunk=spec_chunk)
    assert got == want
    assert m.spec_rounds % spec_chunk == 0


def test_spec_serve_budget_exhaustion_and_refill(params, rng):
    """More requests than slots + budgets hitting mid-round: every request
    finishes with exactly its budget (no overshoot leaks)."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, 4))
               for _ in range(5)]
    got, m = _serve(params, prompts, 5, batch_size=2,
                    speculative="ngram", spec_k=3)
    assert all(len(g) == 5 for g in got)


def test_spec_serve_constructor_guards(params):
    with pytest.raises(ValueError, match="decode_chunk"):
        ContinuousBatcher(GPT2_NANO, params, batch_size=2, max_seq=64,
                          prompt_buckets=(16,), sampling=GREEDY,
                          speculative="ngram", decode_chunk=4)
    with pytest.raises(ValueError, match="prompt lookup"):
        ContinuousBatcher(GPT2_NANO, params, batch_size=2, max_seq=64,
                          prompt_buckets=(16,), sampling=GREEDY,
                          speculative="124M")


def test_spec_serve_mesh_greedy_parity(params, rng):
    """Speculative serving under a (2, 4) mesh — GSPMD partitions the
    extend-based round from the cache/history shardings (no step-SPMD) —
    matches meshless plain serving token for token."""
    from zig_gpt2_tpu.parallel import mesh as pmesh

    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (3, 7, 5)]
    want, _ = _serve(params, prompts, 8, batch_size=2)
    got, m = _serve(params, prompts, 8, batch_size=2,
                    speculative="ngram", spec_k=3,
                    mesh=pmesh.make_mesh(2, 4))
    assert got == want
    assert m.spec_rounds > 0


def test_spec_serve_mesh_quantized_sharded_kernels(params, rng, monkeypatch):
    """INT8 weights + INT8 KV spec serving on a 1x8 mesh with the op-level
    shard_map kernels forced (interpret on CPU): the verify extend's GEMVs
    run through qmm_sharded — parity vs the meshless quantized serve."""
    from zig_gpt2_tpu.parallel import mesh as pmesh
    from zig_gpt2_tpu.parallel import sharding as psh
    from zig_gpt2_tpu.quant import quantize as q

    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, n))
               for n in (4, 6)]
    padded, cfg = psh.pad_for_tp(params, GPT2_NANO, 8)
    qparams = q.quantize_params(padded, mode="int8", tp=8)

    import dataclasses

    base_cfg = dataclasses.replace(cfg, spmd=False)
    b = ContinuousBatcher(base_cfg, qparams, batch_size=2, max_seq=64,
                          prompt_buckets=(16,), sampling=GREEDY,
                          kv_quant="int8")
    rids = [b.submit(p, max_new_tokens=6) for p in prompts]
    done = b.run()
    want = [{r.rid: r.generated for r in done}[r] for r in rids]

    monkeypatch.setenv("ZG2_SPMD_KERNELS", "interpret")
    mesh = pmesh.make_mesh(1, 8)
    sharded = jax.device_put(
        qparams, pmesh.param_shardings(mesh, cfg, qparams))
    b2 = ContinuousBatcher(cfg, sharded, batch_size=2, max_seq=64,
                           prompt_buckets=(16,), sampling=GREEDY,
                           kv_quant="int8", mesh=mesh,
                           speculative="ngram", spec_k=3)
    rids2 = [b2.submit(p, max_new_tokens=6) for p in prompts]
    done2 = b2.run()
    got = [{r.rid: r.generated for r in done2}[r] for r in rids2]
    assert got == want


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_spec_serve_randomized_lifecycle_parity(params, kv_quant):
    """Seeded stress: 12 requests with random prompt lengths (including
    length-1, which exercises the hist_len>ngram lookup guard), random
    budgets (including 1), and random stop tokens, streamed through 3
    slots with spec_chunk=2 — exact greedy parity with plain serving
    through every admission/retirement edge."""
    r = np.random.default_rng(42)
    reqs = []
    for _ in range(12):
        n = int(r.integers(1, 15))
        prompt = list(r.integers(0, GPT2_NANO.vocab_size, n))
        budget = int(r.integers(1, 10))
        stops = tuple(r.integers(0, GPT2_NANO.vocab_size,
                                 int(r.integers(0, 3))))
        reqs.append((prompt, budget, stops))

    def run(**kw):
        b = ContinuousBatcher(GPT2_NANO, params, batch_size=3, max_seq=64,
                              prompt_buckets=(16,), sampling=GREEDY,
                              kv_quant=kv_quant, **kw)
        rids = [b.submit(p, max_new_tokens=m, stop_tokens=s)
                for p, m, s in reqs]
        by = {q.rid: q.generated for q in b.run()}
        return [by[i] for i in rids]

    want = run()
    got = run(speculative="ngram", spec_k=2, spec_chunk=2)
    assert got == want


def test_spec_serve_temperature_runs(params, rng):
    """Sampled mode executes end to end (law-level exactness is pinned by
    the engine's distribution tests on the shared core); budgets hold."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, 5))
               for _ in range(3)]
    got, _ = _serve(params, prompts, 6, batch_size=2,
                    speculative="ngram", spec_k=2)
    # overwrite sampling: _serve pins GREEDY, so call directly here
    b = ContinuousBatcher(GPT2_NANO, params, batch_size=2, max_seq=64,
                          prompt_buckets=(16,),
                          sampling=SamplingConfig(temperature=0.8, seed=1),
                          speculative="ngram", spec_k=2)
    rids = [b.submit(p, max_new_tokens=6) for p in prompts]
    done = b.run()
    assert len(done) == 3
    assert all(len(r.generated) == 6 for r in done)


def test_spec_auto_off_parity_and_telemetry(params, rng):
    """Speculation AUTO-OFF (spec_min_tpr): random traffic accepts ~nothing
    (tokens_per_round ~1), so an impossible threshold must flip the batcher
    onto the plain decode path mid-run — and the committed streams must
    stay bit-identical to plain serving THROUGH the switch (the fallback
    is the same exact greedy law). The r05 hardware motivation: the same
    spec serve config measured +60% on greedy repeat traffic but 0.43x at
    temperature 0.2 (ABRUN_r5 serve16_spec_k4)."""
    prompts = [list(rng.integers(0, GPT2_NANO.vocab_size, 4 + n % 7))
               for n in range(24)]
    want, _ = _serve(params, prompts, 12, batch_size=8)
    got, m = _serve(params, prompts, 12, batch_size=8,
                    speculative="ngram", spec_k=3,
                    spec_min_tpr=100.0)  # impossible bar: must trip
    assert got == want
    assert m.spec_auto_off_step is not None
    assert m.as_dict(8)["spec_auto_off_step"] == m.spec_auto_off_step
    # Rounds stopped accumulating after the switch: strictly fewer
    # slot-rounds than a full spec run of this workload would record.
    full, mf = _serve(params, prompts, 12, batch_size=8,
                      speculative="ngram", spec_k=3, spec_min_tpr=0.0)
    assert full == want
    assert mf.spec_auto_off_step is None
    assert m.spec_slot_rounds < mf.spec_slot_rounds

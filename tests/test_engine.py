"""Runtime engine tests: streaming decode, sampling reproducibility, stop
handling, host-loop vs on-device-scan equivalence."""

import io

import jax
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import GenerationMetrics, InferenceEngine, StreamDecoder
from zig_gpt2_tpu.runtime.sampling import sample
from zig_gpt2_tpu.tokenizer import Encoder, train_bpe

CFG = GPT2_NANO


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(CFG, jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def engine(params):
    return InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,))


def test_greedy_deterministic(engine):
    ids = [1, 2, 3, 4]
    out1 = engine.generate(ids, max_new_tokens=8, sampling=SamplingConfig(temperature=0.0))
    out2 = engine.generate(ids, max_new_tokens=8, sampling=SamplingConfig(temperature=0.0))
    assert out1 == out2
    assert len(out1) == 8


def test_seeded_sampling_reproducible(engine):
    ids = [5, 6, 7]
    s = SamplingConfig(temperature=0.8, seed=123)
    assert engine.generate(ids, 8, s) == engine.generate(ids, 8, s)
    s2 = SamplingConfig(temperature=0.8, seed=124)
    # Different seed should (overwhelmingly likely) differ somewhere.
    assert engine.generate(ids, 8, s) != engine.generate(ids, 8, s2)


def test_context_budget(engine):
    """max_new_tokens=None runs to the window end (reference main.zig:330)."""
    ids = [1] * 5
    out = engine.generate(ids, max_new_tokens=None, sampling=SamplingConfig(temperature=0.0))
    assert len(out) == 32 - 5


def test_stop_tokens(engine):
    ids = [1, 2, 3]
    full = engine.generate(ids, 12, SamplingConfig(temperature=0.0))
    stop = full[4]
    out = engine.generate(ids, 12, SamplingConfig(temperature=0.0), stop_tokens=[stop])
    assert stop not in out
    assert out == full[: full.index(stop)]


def test_host_loop_matches_scan(engine, params):
    """The streaming host loop and the fully-on-device lax.scan loop must
    produce identical tokens (greedy)."""
    ids = [3, 1, 4, 1, 5]
    host = engine.generate(ids, 10, SamplingConfig(temperature=0.0))
    prompts = np.zeros((1, 8), np.int32)
    prompts[0, : len(ids)] = ids
    scan = engine.generate_scan(prompts, [len(ids)], 10, SamplingConfig(temperature=0.0))
    # host loop yields the prefill-sampled token first, then steps; scan
    # returns the tokens produced by each step — align: host[0] is the token
    # fed into step 1, whose output is scan[0] == host[1].
    assert host[1:] == list(scan[0][: len(host) - 1])


class TestChunkedStreaming:
    """generate_iter with decode_chunk > 1 must be invisible in the output:
    same tokens, same stop behavior, same budget — one host sync per chunk
    instead of per token (VERDICT round-2 item 4)."""

    @pytest.fixture(scope="class")
    def chunked(self, params):
        return InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                               decode_chunk=4)

    def test_matches_per_token_stream(self, engine, chunked):
        ids = [1, 2, 3, 4]
        for s in (SamplingConfig(temperature=0.0),
                  SamplingConfig(temperature=0.8, seed=3)):
            base = engine.generate(ids, 10, s)
            got = chunked.generate(ids, 10, s)
            assert got == base

    def test_non_multiple_budget(self, engine, chunked):
        ids = [5, 6]
        base = engine.generate(ids, 7, SamplingConfig(temperature=0.0))
        got = chunked.generate(ids, 7, SamplingConfig(temperature=0.0))
        assert got == base and len(got) == 7

    def test_stop_tokens_mid_chunk(self, engine, chunked):
        ids = [1, 2, 3]
        full = engine.generate(ids, 12, SamplingConfig(temperature=0.0))
        stop = full[4]  # index 4 is mid-chunk for chunk=4
        out = chunked.generate(ids, 12, SamplingConfig(temperature=0.0),
                               stop_tokens=[stop])
        assert stop not in out
        assert out == full[: full.index(stop)]

    def test_context_budget_with_headroom(self, chunked):
        """Full-window run: overshoot steps must stay in the headroom rows
        and the visible stream must still be max_seq - len(prompt)."""
        ids = [1] * 5
        out = chunked.generate(ids, None, SamplingConfig(temperature=0.0))
        assert len(out) == 32 - 5

    def test_metrics(self, chunked):
        m = GenerationMetrics()
        chunked.generate([1, 2], 6, SamplingConfig(temperature=0.0), metrics=m)
        assert m.generated_tokens == 6
        assert len(m.per_token_ms) >= 6


def test_metrics_populated(engine):
    m = GenerationMetrics()
    engine.generate([1, 2], 6, SamplingConfig(temperature=0.0), metrics=m)
    assert m.prompt_tokens == 2
    assert m.generated_tokens >= 5
    assert m.prefill_ms > 0 and m.decode_ms > 0
    assert m.ms_per_token_percentile(50) > 0


def test_sample_top_k():
    key = jax.random.PRNGKey(0)
    logits = jax.numpy.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]] * 64)
    toks = np.asarray(sample(logits, key, temperature=1.0, top_k=2))
    assert set(toks.tolist()) <= {3, 4}


def test_stream_decoder_partial_utf8():
    text = "héllo wörld — ünïcode"
    vocab, merges = train_bpe(text * 3, vocab_size=300)
    enc = Encoder(vocab, merges)
    ids = enc.encode(text)
    dec = StreamDecoder(enc)
    out = "".join(dec.push(i) for i in ids) + dec.flush()
    assert out == text
    # Adversarial: single bytes of a multi-byte char arrive as separate tokens.
    b2u = enc.byte_to_unicode
    euro = "€".encode("utf-8")  # 3 bytes
    byte_tokens = [enc.vocab[b2u[b]] for b in euro]
    dec = StreamDecoder(enc)
    chunks = [dec.push(t) for t in byte_tokens]
    assert chunks[:2] == ["", ""] and chunks[2] == "€"


def test_generate_text_streams(params):
    text = "the quick brown fox jumps over the lazy dog. " * 4
    vocab, merges = train_bpe(text, vocab_size=300)
    enc = Encoder(vocab, merges)
    cfg = GPTConfig(vocab_size=len(vocab), context_size=64,
                    n_layers=CFG.n_layers, n_heads=CFG.n_heads, n_embed=CFG.n_embed)
    p = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(cfg, p, enc, max_seq=32, prompt_buckets=(8,))
    sink = io.StringIO()
    out = eng.generate_text("the quick", 10, SamplingConfig(temperature=0.0), stream_to=sink)
    assert sink.getvalue() == out
    assert enc.decode(enc.encode(out)) == out  # valid tokenizable text


class TestDebugTools:
    def test_checked_decode_step_catches_overflow(self, rng):
        import jax.numpy as jnp
        import numpy as np

        from zig_gpt2_tpu.config import GPT2_NANO
        from zig_gpt2_tpu.models import gpt2
        from zig_gpt2_tpu.utils.debug import checked_decode_step

        params = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
        step = checked_decode_step(GPT2_NANO)
        cache = gpt2.init_kv_cache(GPT2_NANO, 1, 16)
        tok = jnp.zeros((1,), jnp.int32)

        cache["length"] = jnp.asarray([3], jnp.int32)
        err, (cache2, logits) = step(params, cache, tok)
        err.throw()  # in-bounds: no error
        assert np.isfinite(np.asarray(logits, np.float32)).all()

        cache2["length"] = jnp.asarray([16], jnp.int32)  # == max_seq: overflow
        err, _ = step(params, cache2, tok)
        with pytest.raises(Exception, match="overflow"):
            err.throw()

    def test_nan_checks_context(self):
        from zig_gpt2_tpu.utils.debug import nan_checks

        with nan_checks():
            assert jax.config.jax_debug_nans
        assert not jax.config.jax_debug_nans


class TestMeshServing:
    """User-facing sharded serving (VERDICT round-1 item 1): the engine and
    batcher constructed with a mesh must generate exactly the same greedy
    tokens as their single-device counterparts, on the 8-device CPU mesh."""

    def test_engine_mesh_greedy_matches_single_device(self, params):
        from zig_gpt2_tpu.parallel import mesh as pmesh

        base = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,))
        ids = [9, 8, 7, 6]
        want = base.generate(ids, 10, SamplingConfig(temperature=0.0))

        mesh = pmesh.make_mesh(1, 8)
        eng = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                              mesh=mesh)
        assert eng.config.spmd and eng.config.attn_heads == 8  # padded 4 -> 8
        got = eng.generate(ids, 10, SamplingConfig(temperature=0.0))
        assert got == want

    def test_engine_mesh_seeded_sampling_runs(self, params):
        from zig_gpt2_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(1, 8)
        eng = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                              mesh=mesh)
        s = SamplingConfig(temperature=0.8, seed=3)
        out = eng.generate([1, 2, 3], 6, s)
        assert len(out) == 6
        assert eng.generate([1, 2, 3], 6, s) == out  # reproducible

    def test_engine_mesh_quantized(self, params):
        """INT8 weights + INT8 KV cache under a 1x8 mesh (the cli.py order:
        pad -> quantize(tp) -> shard)."""
        import jax as _jax

        from zig_gpt2_tpu.parallel import mesh as pmesh
        from zig_gpt2_tpu.parallel import sharding as psh
        from zig_gpt2_tpu.quant import quantize as q

        padded, cfg = psh.pad_for_tp(params, CFG, 8)
        qparams = q.quantize_params(padded, mode="int8", tp=8)
        base = InferenceEngine(
            dataclasses_replace_spmd_off(cfg), qparams, max_seq=32,
            prompt_buckets=(8,), kv_quant="int8",
        )
        ids = [4, 3, 2, 1]
        want = base.generate(ids, 8, SamplingConfig(temperature=0.0))

        mesh = pmesh.make_mesh(1, 8)
        sharded = _jax.device_put(
            qparams, pmesh.param_shardings(mesh, cfg, qparams)
        )
        eng = InferenceEngine(cfg, sharded, max_seq=32, prompt_buckets=(8,),
                              kv_quant="int8", mesh=mesh)
        got = eng.generate(ids, 8, SamplingConfig(temperature=0.0))
        assert got == want

    def test_engine_batch_not_divisible_raises(self, params):
        from zig_gpt2_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(2, 4)
        with pytest.raises(ValueError, match="not divisible"):
            InferenceEngine(CFG, params, batch_size=1, mesh=mesh)

    def test_batcher_mesh_matches_single_device(self, params):
        from zig_gpt2_tpu.parallel import mesh as pmesh
        from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

        prompts = [[1, 2, 3], [7, 5], [9, 9, 9, 9], [2, 4, 6], [8]]

        def run(mesh):
            b = ContinuousBatcher(
                CFG, params, batch_size=4, max_seq=24, prompt_buckets=(8,),
                sampling=SamplingConfig(temperature=0.0), mesh=mesh,
            )
            rids = [b.submit(p, max_new_tokens=6) for p in prompts]
            done = {r.rid: r.generated for r in b.run()}
            return [done[r] for r in rids]

        want = run(None)
        # 2x2 submesh: dp AND tp exercised together.
        got = run(pmesh.make_mesh(2, 2, devices=jax.devices()[:4]))
        assert got == want


def dataclasses_replace_spmd_off(cfg):
    import dataclasses

    return dataclasses.replace(cfg, spmd=False)


class TestTopP:
    def test_top_p_restricts_support(self, rng):
        """With a peaked distribution and small top_p, only the top token
        can be drawn; with top_p=1.0 the tail is reachable."""
        import jax.numpy as jnp

        from zig_gpt2_tpu.runtime.sampling import sample

        logits = jnp.asarray([[5.0, 4.5, 0.0, -1.0, -2.0]] * 64, jnp.float32)
        key = jax.random.PRNGKey(0)
        toks = np.asarray(sample(logits, key, temperature=1.0, top_p=0.5))
        assert set(toks.tolist()) <= {0}, toks  # p(top1)=0.62 > 0.5 nucleus
        toks2 = np.asarray(sample(logits, key, temperature=1.0, top_p=0.95))
        assert set(toks2.tolist()) <= {0, 1}
        toks3 = np.asarray(sample(logits, jax.random.PRNGKey(3), 2.0, None, 1.0))
        assert len(set(toks3.tolist())) > 2  # full support at top_p=1

    def test_top_p_with_top_k_compose(self, rng):
        import jax.numpy as jnp

        from zig_gpt2_tpu.runtime.sampling import sample

        logits = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
        toks = sample(logits, jax.random.PRNGKey(1), 1.0, top_k=8, top_p=0.9)
        assert toks.shape == (32,)


def test_chunked_metrics_count_yielded_only(params):
    """per_token_ms records only YIELDED tokens: chunk overshoot steps
    must not add phantom entries (len == generated_tokens)."""
    eng = InferenceEngine(CFG, params, max_seq=32, prompt_buckets=(8,),
                          decode_chunk=4)
    m = GenerationMetrics()
    out = eng.generate([1, 2, 3], 10, SamplingConfig(temperature=0.0),
                       metrics=m)
    assert len(out) == 10
    assert m.generated_tokens == 10
    assert len(m.per_token_ms) == 10

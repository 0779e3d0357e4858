"""Speculative decoding (runtime/speculative.py).

Correctness contract: the emitted token stream is distributed exactly as
target-alone decoding — greedy speculative decode must be bit-identical to
InferenceEngine's greedy stream (any draft, any k), and temperature mode's
accept/residual-resample construction must reproduce the target's
next-token distribution. Also covers the `gpt2.extend` primitive against
sequential decode_steps (the multi-token verify pass is new model surface).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import InferenceEngine
from zig_gpt2_tpu.runtime.speculative import SpeculativeEngine

TCFG = GPTConfig(vocab_size=512, context_size=128, n_layers=2, n_heads=4,
                 n_embed=128)
DCFG = GPTConfig(vocab_size=512, context_size=128, n_layers=1, n_heads=2,
                 n_embed=64)


def _params(cfg, seed, scale=3.0):
    # Scale up the 0.02-std init so greedy streams are diverse (unscaled
    # random-init GPT-2 collapses to a fixed point, which would make the
    # parity assertions vacuous).
    p = gpt2.init_params(cfg, jax.random.PRNGKey(seed), jnp.float32)
    return jax.tree.map(lambda x: x * scale, p)


@pytest.fixture(scope="module")
def tparams():
    return _params(TCFG, 0)


@pytest.fixture(scope="module")
def dparams():
    return _params(DCFG, 1)


def _prompts(b=2, n=8):
    rng = np.random.default_rng(0)
    return rng.integers(0, TCFG.vocab_size, (b, n)).astype(np.int32)


# ---------------------------------------------------------------------------
# gpt2.extend — the multi-token verify/catch-up primitive
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_extend_matches_sequential_decode(tparams, kv_quant):
    B, T = 2, 4
    rng = np.random.default_rng(1)
    cache = gpt2.init_kv_cache(TCFG, B, 64, quant=kv_quant)
    prompt = jnp.asarray(rng.integers(0, TCFG.vocab_size, (B, 6)), jnp.int32)
    lens = jnp.asarray([6, 4], jnp.int32)
    cache, _ = gpt2.prefill(tparams, cache, prompt, lens, TCFG)

    toks = jnp.asarray(rng.integers(0, TCFG.vocab_size, (B, T)), jnp.int32)
    valid = jnp.asarray([4, 2], jnp.int32)
    seq = cache
    ref = np.zeros((B, T, TCFG.vocab_size), np.float32)
    for t in range(T):
        seq, lg = gpt2.decode_step(tparams, seq, toks[:, t], TCFG)
        ref[:, t] = np.asarray(lg)
    ext, logits = gpt2.extend(tparams, cache, toks, valid, TCFG)
    logits = np.asarray(logits)
    for b in range(B):
        v = int(valid[b])
        np.testing.assert_allclose(logits[b, :v], ref[b, :v],
                                   rtol=2e-4, atol=2e-4)
        # length advances by the VALID count only
        assert int(ext["length"][b]) == int(cache["length"][b]) + v
        # appended cache rows match the sequential path's
        base = int(cache["length"][b])
        np.testing.assert_allclose(
            np.asarray(ext["k"])[:, b, :, base:base + v],
            np.asarray(seq["k"])[:, b, :, base:base + v],
            rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# greedy speculative == greedy target (bit-identical)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [1, 3, 5])
def test_greedy_parity(tparams, dparams, k):
    B, P, S = 2, 8, 24
    prompts = _prompts(B, P)
    lens = [P, 5]
    eng = InferenceEngine(TCFG, tparams, batch_size=B, max_seq=64,
                          prompt_buckets=(P,))
    ref = eng.generate_scan(prompts, lens, S, SamplingConfig(temperature=0.0))
    assert len(set(ref[0].tolist())) > 3  # stream must be non-degenerate
    spec = SpeculativeEngine(TCFG, tparams, DCFG, dparams, k=k, batch_size=B,
                             max_seq=64, prompt_buckets=(P,))
    out = spec.generate_scan(prompts, lens, S,
                             SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(out, ref)


def test_self_draft_accepts_everything(tparams):
    """Draft == target: every proposal is accepted, so the round count hits
    the ceiling steps/(k+1) and the full-accept (pend/pv) bookkeeping path
    is exercised every round."""
    B, P, S, k = 2, 8, 24, 4
    prompts = _prompts(B, P)
    lens = [P, 5]
    eng = InferenceEngine(TCFG, tparams, batch_size=B, max_seq=64,
                          prompt_buckets=(P,))
    ref = eng.generate_scan(prompts, lens, S, SamplingConfig(temperature=0.0))
    spec = SpeculativeEngine(TCFG, tparams, TCFG, tparams, k=k, batch_size=B,
                             max_seq=64, prompt_buckets=(P,))
    out = spec.generate_scan(prompts, lens, S,
                             SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(out, ref)
    assert spec.last_rounds == -(-S // (k + 1))


@pytest.mark.parametrize("draft_kv", [None, "int8"])
def test_greedy_parity_quantized(tparams, dparams, draft_kv):
    """INT8-quantized target weights + INT8 KV caches through the extend
    path (and optionally an INT8 DRAFT cache — the catch-up extend's
    quantize-on-append): speculative greedy still matches the
    (same-quantized) engine."""
    from zig_gpt2_tpu.quant import quantize as q

    B, P, S = 2, 8, 16
    tq = q.quantize_params(tparams, mode="int8")
    prompts = _prompts(B, P)
    lens = [P, 5]
    eng = InferenceEngine(TCFG, tq, batch_size=B, max_seq=64,
                          prompt_buckets=(P,), kv_quant="int8")
    ref = eng.generate_scan(prompts, lens, S, SamplingConfig(temperature=0.0))
    spec = SpeculativeEngine(TCFG, tq, DCFG, dparams, k=3, batch_size=B,
                             max_seq=64, prompt_buckets=(P,),
                             kv_quant="int8", draft_kv_quant=draft_kv)
    out = spec.generate_scan(prompts, lens, S,
                             SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(out, ref)


# ---------------------------------------------------------------------------
# temperature mode: exact target distribution
# ---------------------------------------------------------------------------


def test_temperature_matches_target_distribution():
    """The accept/residual-resample construction must make the FIRST
    emitted token's law equal the target's next-token distribution (this
    is the theorem speculative sampling rests on; one round with k=2 and a
    DIFFERENT draft exercises accept, reject-resample, and bonus paths).
    Empirical check: N seeded draws vs the exact softmax, vocab 16."""
    vocab = 16
    tcfg = GPTConfig(vocab_size=vocab, context_size=32, n_layers=1,
                     n_heads=2, n_embed=32)
    tp = _params(tcfg, 2, scale=2.0)
    dp = _params(tcfg, 3, scale=2.0)
    P0 = 4
    prompts = np.arange(P0, dtype=np.int32)[None] % vocab
    temp = 0.9

    # Exact target law for the first emitted token: softmax of the target
    # logits after consuming [prompt, t0], marginalized over t0 draws —
    # condition on a FIXED t0 instead by making the prefill-sample greedy:
    # temperature sampling draws t0 too, so fix the comparison by computing
    # the mixture directly (vocab is tiny): P(first) = sum_t0 P(t0) P(.|t0).
    cache = gpt2.init_kv_cache(tcfg, 1, 32)
    cache, lg0 = gpt2.prefill(tp, cache, jnp.asarray(prompts),
                              jnp.asarray([P0], jnp.int32), tcfg)
    p_t0 = np.asarray(jax.nn.softmax(lg0[0].astype(jnp.float32) / temp))
    mix = np.zeros(vocab)
    for t0 in range(vocab):
        c2, lg1 = gpt2.decode_step(tp, jax.tree.map(lambda x: x, cache),
                                   jnp.asarray([t0], jnp.int32), tcfg)
        p1 = np.asarray(jax.nn.softmax(lg1[0].astype(jnp.float32) / temp))
        mix += p_t0[t0] * p1

    spec = SpeculativeEngine(tcfg, tp, tcfg, dp, k=2, batch_size=1,
                             max_seq=32, prompt_buckets=(P0,))
    N = 3000
    counts = np.zeros(vocab)
    samp = SamplingConfig(temperature=temp)
    for seed in range(N):
        s = SamplingConfig(temperature=temp, seed=seed)
        out = spec.generate_scan(prompts, [P0], 1, s)
        counts[int(out[0, 0])] += 1
    emp = counts / N
    # 4-sigma binomial tolerance per bin
    tol = 4 * np.sqrt(np.maximum(mix * (1 - mix), 1e-4) / N)
    assert np.all(np.abs(emp - mix) < tol + 0.01), (emp, mix)


def test_topk_matches_target_distribution():
    """top-k speculative sampling must equal the target's TRUNCATED law
    (the same support mask is applied to p and q before the acceptance
    test). Same mixture construction as the temperature test, with top_k
    masking at every stage; also implicitly checks the mask composes with
    the one-hot-Q ngram mode is NOT used here (draft mode)."""
    from zig_gpt2_tpu.runtime.sampling import _mask_logits

    vocab, top_k = 16, 4
    tcfg = GPTConfig(vocab_size=vocab, context_size=32, n_layers=1,
                     n_heads=2, n_embed=32)
    tp = _params(tcfg, 2, scale=2.0)
    dp = _params(tcfg, 3, scale=2.0)
    P0 = 4
    prompts = np.arange(P0, dtype=np.int32)[None] % vocab
    temp = 0.9

    def tprobs(lg):
        return np.asarray(jax.nn.softmax(
            _mask_logits(lg.astype(jnp.float32) / temp, top_k, None)))

    cache = gpt2.init_kv_cache(tcfg, 1, 32)
    cache, lg0 = gpt2.prefill(tp, cache, jnp.asarray(prompts),
                              jnp.asarray([P0], jnp.int32), tcfg)
    p_t0 = tprobs(lg0[0])
    mix = np.zeros(vocab)
    for t0 in range(vocab):
        if p_t0[t0] == 0.0:
            continue
        c2, lg1 = gpt2.decode_step(tp, jax.tree.map(lambda x: x, cache),
                                   jnp.asarray([t0], jnp.int32), tcfg)
        mix += p_t0[t0] * tprobs(lg1[0])

    spec = SpeculativeEngine(tcfg, tp, tcfg, dp, k=2, batch_size=1,
                             max_seq=32, prompt_buckets=(P0,))
    N = 2000
    counts = np.zeros(vocab)
    for seed in range(N):
        s = SamplingConfig(temperature=temp, top_k=top_k, seed=seed)
        out = spec.generate_scan(prompts, [P0], 1, s)
        counts[int(out[0, 0])] += 1
    emp = counts / N
    # tokens outside every stage's top-k support must never appear
    assert np.all(counts[mix == 0.0] == 0)
    tol = 4 * np.sqrt(np.maximum(mix * (1 - mix), 1e-4) / N)
    assert np.all(np.abs(emp - mix) < tol + 0.012), (emp, mix)


# ---------------------------------------------------------------------------
# streaming iterator
# ---------------------------------------------------------------------------


def test_generate_iter_matches_scan(tparams, dparams):
    """The round-streaming iterator yields [prefill token] + the scan
    stream shifted by one (generate_scan omits the prefill-sampled token,
    generate_iter yields it first — both mirror InferenceEngine)."""
    P, S = 8, 17
    prompts = _prompts(1, P)
    spec = SpeculativeEngine(TCFG, tparams, DCFG, dparams, k=3, batch_size=1,
                             max_seq=64, prompt_buckets=(P,))
    scan = spec.generate_scan(prompts, [P], S,
                              SamplingConfig(temperature=0.0))[0]
    it = list(spec.generate_iter(list(prompts[0]), S,
                                 SamplingConfig(temperature=0.0)))
    assert len(it) == S
    # engine reference stream for the same prompt
    eng = InferenceEngine(TCFG, tparams, batch_size=1, max_seq=64,
                          prompt_buckets=(P,))
    ref = list(eng.generate_iter(list(prompts[0]), S,
                                 SamplingConfig(temperature=0.0)))
    assert it == ref
    # and the scan stream is the iter stream minus the prefill token
    np.testing.assert_array_equal(scan[:-1], np.asarray(it[1:]))


def test_generate_iter_stop_token(tparams, dparams):
    P = 8
    prompts = _prompts(1, P)
    spec = SpeculativeEngine(TCFG, tparams, DCFG, dparams, k=3, batch_size=1,
                             max_seq=64, prompt_buckets=(P,))
    full = list(spec.generate_iter(list(prompts[0]), 16,
                                   SamplingConfig(temperature=0.0)))
    stop = full[5]
    got = list(spec.generate_iter(list(prompts[0]), 16,
                                  SamplingConfig(temperature=0.0),
                                  stop_tokens=[stop]))
    assert got == full[:full.index(stop)]


# ---------------------------------------------------------------------------
# prompt-lookup (draft-free) mode
# ---------------------------------------------------------------------------


def test_ngram_greedy_parity(tparams):
    B, P, S = 2, 8, 24
    prompts = _prompts(B, P)
    lens = [P, 5]
    eng = InferenceEngine(TCFG, tparams, batch_size=B, max_seq=64,
                          prompt_buckets=(P,))
    ref = eng.generate_scan(prompts, lens, S, SamplingConfig(temperature=0.0))
    spec = SpeculativeEngine(TCFG, tparams, k=3, batch_size=B, max_seq=64,
                             prompt_buckets=(P,))
    out = spec.generate_scan(prompts, lens, S,
                             SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(out, ref)


def test_ngram_repetition_hits_ceiling():
    """An unscaled random-init model collapses to a fixed point; prompt
    lookup must ride the loop at full acceptance (cyclic continuation) —
    the round count hits ceil(S / (k+1))."""
    P, S, k = 8, 24, 4
    tp = gpt2.init_params(TCFG, jax.random.PRNGKey(0), jnp.float32)
    prompts = _prompts(1, P)
    eng = InferenceEngine(TCFG, tp, batch_size=1, max_seq=64,
                          prompt_buckets=(P,))
    ref = eng.generate_scan(prompts, [P], S, SamplingConfig(temperature=0.0))
    assert len(set(ref[0, 4:].tolist())) == 1  # stream really is a loop
    spec = SpeculativeEngine(TCFG, tp, k=k, batch_size=1, max_seq=64,
                             prompt_buckets=(P,))
    out = spec.generate_scan(prompts, [P], S, SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(out, ref)
    assert spec.last_rounds == -(-S // (k + 1))


def test_ngram_temperature_runs(tparams):
    """Temperature mode with one-hot Q: runs, emits the full budget, and
    differs across seeds (stochastic) — the exactness argument is the same
    acceptance identity covered by test_temperature_matches_target_
    distribution with q one-hot being a special case."""
    P, S = 8, 16
    prompts = _prompts(1, P)
    spec = SpeculativeEngine(TCFG, tparams, k=3, batch_size=1, max_seq=64,
                             prompt_buckets=(P,))
    a = spec.generate_scan(prompts, [P], S, SamplingConfig(temperature=0.9,
                                                           seed=0))
    b = spec.generate_scan(prompts, [P], S, SamplingConfig(temperature=0.9,
                                                           seed=1))
    assert a.shape == b.shape == (1, S)
    assert not np.array_equal(a, b)

"""Speculative decoding: a small DRAFT model proposes k tokens per round;
the TARGET model verifies all of them in ONE multi-token ``gpt2.extend``
pass and keeps the longest accepted prefix (+1 token sampled from its own
distribution). Output tokens are distributed EXACTLY as target-alone
decoding — greedy speculative decode reproduces the target's greedy
stream, and temperature sampling uses the standard accept /
residual-resample construction ("Fast Inference from Transformers via
Speculative Decoding", Leviathan et al. 2023; "Accelerating LLM Decoding
with Speculative Sampling", Chen et al. 2023), whose acceptance test makes
the marginal law of every emitted token equal the target's. (Bit-identity holds when verify and
decode compute numerically identical logits — pinned on CPU by the test
suite. On TPU the verify pass is a DIFFERENT numerical program — plain-XLA
extend_attention over an unpacked cache vs the fused packed decode kernel
— so an argmax near-tie can legitimately pick the other token; the
distributions are the same, the bits may not be.)

Why this wins on TPU at B=1: the decode GEMVs are weight-streaming bound
(BENCHMARKS.md perf model — the MXU weight-load rate, ~480 Gelem/s,
dtype-invariant), so a verify pass over k+1 query rows costs ~the same HBM
time as ONE row. Each round streams the target weights once for up to k+1
committed tokens instead of once per token; the draft adds k small-model
steps. Beyond-parity feature: the reference has nothing like it
(/root/reference/src/main.zig:322-342 decodes strictly one token per
forward).

Round invariants (per batch lane; all under one jitted lax.while_loop):
  - both caches hold M processed tokens; ``tok`` is committed-but-unprocessed;
  - the draft may additionally be ONE token behind (``pend``/``pend_valid``:
    when the previous round accepted all k drafts, the bonus token's
    predecessor d_k was never decode_step'd through the draft);
  - draft: one 2-token ``extend`` catch-up (valid 1 or 2) yields the first
    proposal's distribution, then k-1 decode_steps propose the rest;
  - target: one (k+1)-token ``extend`` over [tok, d_1..d_k] yields P_1..P_k
    (verify) and P_{k+1} (bonus);
  - accept a = longest prefix with u_i·q_i(d_i) < p_i(d_i) (greedy:
    argmax P_i == d_i); emit d_1..d_a plus one token from
    norm(max(P_{a+1}-Q_{a+1}, 0)) (a<k) or P_{k+1} (a==k — Q padded with a
    zero row makes both the same gather);
  - cache lengths rewind to M+1+a (rows past them are garbage that the next
    round's appends overwrite — the fixed-shape cache IS the rollback).

Draft-free mode (PROMPT LOOKUP, ``draft_config=None``): proposals come
from the token history instead of a model — continue the most recent
earlier occurrence of the last n committed tokens, cyclically with the
match's period (exact for repetition loops). The acceptance rule treats
the deterministic proposal as a one-hot draft distribution, so exactness
is preserved; a useless proposal just degrades to ~1 committed token per
round at the cost of one extend vs one decode_step.

top-k / top-p ride the same machinery: the support mask is applied to the
logits on BOTH sides before softmax (the speculative identity holds for
any (p, q) pair), so the output law is exactly the target's truncated
sampling — matching InferenceEngine's semantics.

Scope (v1): single-device. The TARGET cache is unpacked (it only ever
sees ``gpt2.extend``, where packing buys nothing — see
_single_device_config); the DRAFT may keep the head-pair-packed layout
for its fused decode_steps via ZG2_SPEC_DRAFT_PACKED=1 (extend handles
packed caches since round 4).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import cache_formats


def _single_device_config(config: GPTConfig, extend_only: bool) -> GPTConfig:
    """Resolve the KV-cache layout for one speculative-engine model.

    TARGET (extend_only=True): always UNPACKED. Its cache only ever sees
    gpt2.extend (verify), where packing buys no fused kernel and costs an
    unpack-view read per layer.

    DRAFT (extend_only=False): runs k-1 fused decode_steps per round plus
    one 2-token catch-up extend, so the packed layout's fused-attention
    win applies — but it has never been measured on hardware in this
    combination, so it is opt-in via ZG2_SPEC_DRAFT_PACKED=1 (A/B in
    tools/ab/run_all.sh) until the chip says otherwise.
    """
    import os

    if config.spmd or config.mesh is not None:
        raise ValueError("SpeculativeEngine is single-device (v1): pass "
                         "unsharded params/configs")
    want = False
    if not extend_only and os.environ.get("ZG2_SPEC_DRAFT_PACKED") == "1":
        want = gpt2.default_kv_packed(config)
    if config.kv_packed != want:
        config = dataclasses.replace(config, kv_packed=want)
    return config


def _scaled(logits: jax.Array, temperature: float,
            top_k: Optional[int], top_p: Optional[float]) -> jax.Array:
    """Temperature-scaled logits with the top-k / nucleus support mask
    applied — the ACTUAL sampling distribution on both sides of the
    acceptance test (the speculative identity holds for any (p, q) pair,
    so truncated sampling stays exactly the target's truncated law)."""
    from zig_gpt2_tpu.runtime.sampling import _mask_logits

    return _mask_logits(logits.astype(jnp.float32) / temperature,
                        top_k, top_p)


def _probs(logits: jax.Array, temperature: float,
           top_k: Optional[int] = None,
           top_p: Optional[float] = None) -> jax.Array:
    return jax.nn.softmax(_scaled(logits, temperature, top_k, top_p),
                          axis=-1)


def _propose_ngram(hist: jax.Array, hist_len: jax.Array, tok: jax.Array,
                   *, k: int, ngram: int) -> jax.Array:
    """Prompt-lookup proposals: continue the most recent earlier occurrence
    of the last ``ngram`` committed tokens. hist[:, :L] holds every
    committed token INCLUDING the unprocessed ``tok`` at L-1; slots beyond
    are stale emit slack (harmless: a garbage proposal is just rejected).
    Module-level so the serving batcher's speculative mode reuses the same
    code (runtime/batcher.py)."""
    B = tok.shape[0]
    C = hist.shape[1]
    pos = jnp.arange(C)[None, :]  # (1, C)
    # match[b, j] = the ngram ENDING at j equals the one ending at
    # L-1, for j <= L-2 (j indexes hist columns; j >= ngram-1).
    match = jnp.ones((B, C), bool)
    for o in range(ngram):
        tail = jnp.take_along_axis(
            hist, (hist_len - 1 - o)[:, None], axis=1)  # (B, 1)
        shifted = jnp.roll(hist, o, axis=1)  # hist[j-o] at col j
        match &= shifted == tail
    match &= (pos >= ngram - 1) & (pos <= (hist_len - 2)[:, None])
    # Lanes with fewer than ngram+1 committed tokens can't form a
    # valid (tail, earlier-occurrence) pair — and hist_len-1-o goes
    # negative above, wrapping to stale slack slots that fabricate
    # matches. Disable lookup until enough history exists.
    match &= (hist_len > ngram)[:, None]
    j = jnp.max(jnp.where(match, pos, -1), axis=1)  # (B,) last match
    found = j >= 0
    # Continue CYCLICALLY with the match's period p = (L-1) - j:
    # a tail-adjacent match (the common case in a repetition loop)
    # would otherwise run past the written history after p tokens;
    # for a pure period-p loop the wrap is exactly right, and for
    # a distant match (p >= k) it is plain continuation.
    p = jnp.maximum((hist_len - 1) - j, 1)  # (B,)
    offs = jnp.mod(jnp.arange(k)[None, :], p[:, None])  # (B, k)
    idxs = jnp.minimum(j[:, None] + 1 + offs, C - 1)
    props = jnp.take_along_axis(hist, idxs, axis=1)  # (B, k)
    return jnp.where(found[:, None], props,
                     jnp.broadcast_to(tok[:, None], (B, k)))


def _verify_accept_commit(params_t, conf_t: GPTConfig, cache_t, tok, ds, Q,
                          k_acc, k_next, *, k: int, greedy: bool,
                          temperature: float, top_k, top_p):
    """The target side of one speculative round: ONE (k+1)-row verify
    extend over [tok, d_1..d_k], longest-prefix acceptance, and the
    bonus/residual token — the exactness-critical core ("Fast Inference
    from Transformers via Speculative Decoding", Leviathan et al. 2023).
    Module-level so SpeculativeEngine and the serving batcher share one
    copy. Returns (cache_t, emit (B, k+1), a (B,), nxt (B,)) with the
    cache length rewound to the committed prefix (base + 1 + a).

    ``Q``: the draft's (B, k, V) proposal distributions, or None for a
    deterministic proposer (prompt lookup) — treated as one-hot."""
    B = tok.shape[0]
    m_t = cache_t["length"]

    # ---- target: one (k+1)-row verify extend
    wt = jnp.concatenate([tok[:, None], ds], axis=1)  # (B, k+1)
    cache_t, lt = gpt2.extend(
        params_t, cache_t, wt, jnp.full((B,), k + 1, jnp.int32), conf_t)

    # ---- acceptance: longest prefix, then the +1 token
    if greedy:
        tgt = jnp.argmax(lt, axis=-1).astype(jnp.int32)  # (B, k+1)
        acc = tgt[:, :k] == ds  # (B, k)
    else:
        P = _probs(lt, temperature, top_k, top_p)  # (B, k+1, V)
        if Q is None:  # prompt lookup: deterministic proposal =
            # one-hot draft distribution — accept iff u < p(d_i),
            # residual renormalizes P minus the proposal's mass.
            Q = jax.nn.one_hot(ds, P.shape[-1], dtype=P.dtype)
        p_tok = jnp.take_along_axis(P[:, :k], ds[:, :, None], 2)[..., 0]
        q_tok = jnp.take_along_axis(Q, ds[:, :, None], 2)[..., 0]
        u = jax.random.uniform(k_acc, (B, k))
        acc = u * q_tok < p_tok
    a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)

    if greedy:
        nxt = jnp.take_along_axis(tgt, a[:, None], axis=1)[:, 0]
    else:
        # Unified residual/bonus: pad Q with a zero row at index k so
        # the a==k gather subtracts nothing and resamples from P_k+1.
        Qp = jnp.concatenate([Q, jnp.zeros_like(P[:, :1])], axis=1)
        P_a = jnp.take_along_axis(P, a[:, None, None], 1)[:, 0]
        Q_a = jnp.take_along_axis(Qp, a[:, None, None], 1)[:, 0]
        resid = jnp.clip(P_a - Q_a, 0.0, None)
        norm = jnp.sum(resid, axis=-1, keepdims=True)
        # Degenerate all-clipped rows (numerics): fall back to P_a.
        resid = jnp.where(norm > 0, resid / jnp.maximum(norm, 1e-20),
                          P_a)
        nxt = jax.random.categorical(
            k_next, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1
        ).astype(jnp.int32)

    # ---- commit: emit d_1..d_a then nxt at slot a
    slots = jnp.arange(k + 1)[None, :]  # (1, k+1)
    d_pad = jnp.concatenate([ds, jnp.zeros((B, 1), jnp.int32)], axis=1)
    emit = jnp.where(slots < a[:, None], d_pad,
                     jnp.where(slots == a[:, None], nxt[:, None], 0))

    # ---- rewind length to the committed prefix
    cache_t = dict(cache_t, length=m_t + 1 + a)
    return cache_t, emit, a, nxt


class SpeculativeEngine:
    """Draft+target speculative generation engine.

    Args:
      config/params: the TARGET model (the one whose distribution the
        output follows) — quantized or float leaves, as for InferenceEngine.
      draft_config/draft_params: the DRAFT model (same tokenizer family).
      k: draft tokens proposed per round (the verify window is k+1).
      kv_quant / draft_kv_quant: per-model "int8" KV-cache quantization.
    """

    def __init__(
        self,
        config: GPTConfig,
        params,
        draft_config: Optional[GPTConfig] = None,
        draft_params=None,
        k: int = 4,
        batch_size: int = 1,
        max_seq: Optional[int] = None,
        prompt_buckets: Optional[Sequence[int]] = None,
        kv_quant: Optional[str] = None,
        draft_kv_quant: Optional[str] = None,
        ngram: int = 2,
    ):
        """Without a draft model (draft_config=None), proposals come from
        PROMPT LOOKUP instead: the most recent earlier occurrence of the
        last ``ngram`` committed tokens, continued for k tokens (a
        device-side gather over the token history — zero extra model
        FLOPs; the acceptance rule is unchanged with the proposal treated
        as a one-hot draft distribution, so exactness is preserved and a
        useless proposal just degrades to ~one committed token per round).
        Wins on repetitive/quoting text; the only speculation available
        when the target is already the smallest model of the family."""
        if k < 1:
            raise ValueError("k must be >= 1")
        # (Round 4 refused batch_size*(k+1) > 64 — the old stacked-GEMV
        # kernel row bound. Round 5 lifted the kernel cap to 256
        # (quant.kernels.GEMV_MAX_ROWS) and past it the dispatch falls
        # back to the jnp dequant path, slower but correct — no guard.)
        self.config = _single_device_config(config, extend_only=True)
        self.params = params
        self.k = k
        self.batch_size = batch_size
        self.ngram = None if draft_config is not None else max(int(ngram), 1)
        if draft_config is not None:
            self.draft_config = _single_device_config(draft_config,
                                                      extend_only=False)
            self.draft_params = draft_params
            self.max_seq = max_seq or min(config.context_size,
                                          draft_config.context_size)
        else:
            self.draft_config = None
            self.draft_params = None
            self.max_seq = max_seq or config.context_size
        self.prompt_buckets = tuple(
            b for b in (prompt_buckets or (32, 128, 512, self.max_seq))
            if b <= self.max_seq
        ) or (self.max_seq,)
        self.kv_quant = kv_quant
        self.draft_kv_quant = draft_kv_quant
        # Window headroom: a round appends up to k+1 rows past the last
        # committed position before acceptance trims the length back.
        self._rows_t = self.max_seq + self.k + 1
        self._rows_d = self.max_seq + self.k + 1
        # Token history capacity (prompt-lookup mode): committed tokens
        # plus one round's k+1 emit slots of overwritable slack.
        self._hist_cap = self.max_seq + self.k + 1
        self._fmt_t = cache_formats(jax.eval_shape(functools.partial(
            self._new_cache_shape, target=True)))
        self._prefill_t = jax.jit(
            functools.partial(gpt2.prefill, config=self.config),
            donate_argnums=(1,), out_shardings=(self._fmt_t, None))
        if self.ngram is None:
            self._fmt_d = cache_formats(jax.eval_shape(functools.partial(
                self._new_cache_shape, target=False)))
            self._prefill_d = jax.jit(
                functools.partial(gpt2.prefill, config=self.draft_config),
                donate_argnums=(1,), out_shardings=(self._fmt_d, None))
        self._loops: Dict = {}
        self.last_rounds: Optional[int] = None  # acceptance telemetry

    def _new_cache_shape(self, target: bool):
        if target:
            return gpt2.init_kv_cache(
                self.config, self.batch_size, self._rows_t,
                dtype=self.params["wte"].dtype, quant=self.kv_quant)
        return gpt2.init_kv_cache(
            self.draft_config, self.batch_size, self._rows_d,
            dtype=self.draft_params["wte"].dtype, quant=self.draft_kv_quant)

    def _new_caches(self):
        ct = self._new_cache_shape(True)
        if self._fmt_t is not None:
            ct = jax.tree.map(jax.device_put, ct, self._fmt_t)
        if self.ngram is not None:
            return ct, None
        cd = self._new_cache_shape(False)
        if self._fmt_d is not None:
            cd = jax.tree.map(jax.device_put, cd, self._fmt_d)
        return ct, cd

    # -- the speculative round ------------------------------------------------

    def _round_fn(self, temperature: float, top_k=None, top_p=None):
        """Build the ONE-round function shared by the on-device while_loop
        (generate_scan) and the streaming iterator (generate_iter):
        ``(params_t, params_d, carry) -> (carry', emit (B, k+1), n (B,))``
        where carry = (cache_t, dstate, tok, key) — dstate is the draft
        model's (cache_d, pend, pv), or (hist, hist_len) in prompt-lookup
        mode — and the first ``n[b]`` slots of ``emit[b]`` are this
        round's committed tokens."""
        k = self.k
        B = self.batch_size
        conf_t, conf_d = self.config, self.draft_config
        greedy = temperature == 0.0
        ngram = self.ngram

        def propose_draft(params_d, dstate, tok, k_draft):
            # ---- draft: catch-up extend (valid 1 or 2) + k-1 decode steps
            cache_d, pend, pv = dstate
            w0 = jnp.where(pv, pend, tok)
            w1 = jnp.where(pv, tok, jnp.zeros_like(tok))
            wd = jnp.stack([w0, w1], axis=1)  # (B, 2)
            vd = 1 + pv.astype(jnp.int32)
            cache_d, ld = gpt2.extend(params_d, cache_d, wd, vd, conf_d)
            lg = jnp.take_along_axis(ld, (vd - 1)[:, None, None], axis=1)[:, 0]

            def draft_sample(lg, kk):
                if greedy:
                    return jnp.argmax(lg, axis=-1).astype(jnp.int32)
                return jax.random.categorical(
                    kk, _scaled(lg, temperature, top_k, top_p), axis=-1
                ).astype(jnp.int32)

            d_list, q_list = [], []
            dkeys = jax.random.split(k_draft, k)
            d = draft_sample(lg, dkeys[0])
            d_list.append(d)
            if not greedy:
                q_list.append(_probs(lg, temperature, top_k, top_p))
            for i in range(1, k):
                cache_d, lg = gpt2.decode_step(params_d, cache_d, d, conf_d)
                d = draft_sample(lg, dkeys[i])
                d_list.append(d)
                if not greedy:
                    q_list.append(_probs(lg, temperature, top_k, top_p))
            ds = jnp.stack(d_list, axis=1)  # (B, k)
            Q = None if greedy else jnp.stack(q_list, axis=1)
            return (cache_d, pend, pv, vd), ds, Q

        def round_body(params_t, params_d, carry):
            (cache_t, dstate, tok, key) = carry
            m_t = cache_t["length"]
            key, k_draft, k_acc, k_next = jax.random.split(key, 4)

            if ngram is None:
                dmid, ds, Q = propose_draft(params_d, dstate, tok, k_draft)
            else:
                ds = _propose_ngram(dstate[0], dstate[1], tok,
                                    k=k, ngram=ngram)
                Q = None  # deterministic proposal: one-hot inside the core

            cache_t, emit, a, nxt = _verify_accept_commit(
                params_t, conf_t, cache_t, tok, ds, Q, k_acc, k_next,
                k=k, greedy=greedy, temperature=temperature,
                top_k=top_k, top_p=top_p)

            if ngram is None:
                cache_d, _pend, _pv, _vd = dmid
                # cache_d["length"] is already the post-proposal row count
                # (catch-up extend + k-1 steps); the committed prefix may
                # be shorter (a < k) or one LONGER (a == k: d_k was never
                # draft-processed — pend/pv carry it to the next round).
                cache_d = dict(cache_d, length=jnp.minimum(
                    m_t + 1 + a, cache_d["length"]))
                dstate = (cache_d, ds[:, k - 1], a == k)
            else:
                # Append this round's committed tokens to the history at
                # the pre-round end (emit slots beyond a are garbage that
                # the next round's write overwrites — same scheme as the
                # scan output buffer).
                hist, hist_len = dstate
                for b in range(B):
                    hist = jax.lax.dynamic_update_slice(
                        hist, emit[b][None], (b, hist_len[b]))
                dstate = (hist, hist_len + a + 1)
            tok = nxt
            return (cache_t, dstate, tok, key), emit, a + 1

        return round_body

    def _carry_fmt(self):
        """out_shardings pytree pinning the carry's KV-cache leaves to
        their boundary Formats (engine.cache_formats: the default D-minor
        layout). The per-round streaming jit crosses the host boundary
        EVERY round with both caches in the carry — without the pin XLA
        may pick an S-minor entry/exit layout and relayout-copy the full
        caches each round (the measured 47%-of-step trap the engine's
        decode jits all pin against). None (unconstrained) off-TPU."""
        if self._fmt_t is None:
            return None
        dfmt = (None, None) if self.ngram is not None else (
            self._fmt_d, None, None)
        return (self._fmt_t, dfmt, None, None)

    def _init_dstate(self, cache_d, prompts=None, lengths=None, tok=None):
        """Draft mode: (cache_d, pend, pv). Prompt-lookup mode: the token
        history seeded with the prompt and the prefill-sampled token."""
        B = self.batch_size
        if self.ngram is None:
            pend = jnp.zeros((B,), jnp.int32)
            pv = jnp.zeros((B,), bool)
            return (cache_d, pend, pv)
        hist = jnp.zeros((B, self._hist_cap), jnp.int32)
        T = min(prompts.shape[1], self._hist_cap)
        hist = jax.lax.dynamic_update_slice(
            hist, jnp.asarray(prompts, jnp.int32)[:, :T], (0, 0))
        lens = jnp.asarray(lengths, jnp.int32)
        for b in range(B):
            hist = jax.lax.dynamic_update_slice(
                hist, tok[b][None, None], (b, lens[b]))
        return (hist, lens + 1)

    def _make_loop(self, steps: int, temperature: float, top_k=None,
                   top_p=None):
        """(params_t, params_d, cache_t, cache_d, tok, key) ->
        (buf (B, steps+k+1), counts (B,), rounds) — the whole round loop on
        device (generate_scan / bench path)."""
        key_ = ("loop", steps, temperature, top_k, top_p)
        hit = self._loops.get(key_)
        if hit is not None:
            return hit
        B = self.batch_size
        cap = steps + self.k + 1
        round_body = self._round_fn(temperature, top_k, top_p)

        def loop(params_t, params_d, cache_t, dstate, tok, key):
            buf = jnp.zeros((B, cap), jnp.int32)
            cursor = jnp.zeros((B,), jnp.int32)
            carry = ((cache_t, dstate, tok, key),
                     buf, cursor, jnp.zeros((), jnp.int32))

            def cond(c):
                return jnp.min(c[2]) < steps

            def body(c):
                inner, buf, cursor, rounds = c
                inner, emit, n = round_body(params_t, params_d, inner)
                for b in range(B):  # per-lane cursor write (B static)
                    buf = jax.lax.dynamic_update_slice(
                        buf, emit[b][None], (b, cursor[b]))
                return (inner, buf, cursor + n, rounds + 1)

            carry = jax.lax.while_loop(cond, body, carry)
            return carry[1], carry[2], carry[3]

        # No donate on the caches: the loop returns only (buf, counts,
        # rounds), so there is no same-shaped output for XLA to alias the
        # donated buffers into (donation would warn and do nothing).
        fn = jax.jit(loop)
        self._loops[key_] = fn
        return fn

    def _make_round(self, temperature: float, top_k=None, top_p=None):
        """The jitted single round for host-streaming: carry in, carry out,
        plus this round's (B, k+1) tokens and per-lane counts — ONE host
        sync delivers up to k+1 tokens (the speculative analogue of the
        engine's chunked streaming)."""
        key_ = ("round", temperature, top_k, top_p)
        hit = self._loops.get(key_)
        if hit is not None:
            return hit
        fn = jax.jit(self._round_fn(temperature, top_k, top_p),
                     donate_argnums=(2,),
                     out_shardings=(self._carry_fmt(), None, None))
        self._loops[key_] = fn
        return fn

    def _prefill_and_sample(self, toks, lens, sampling: SamplingConfig):
        """Shared generation prologue: fresh caches, target (+draft)
        prefill, the first token sampled from the target's prefill logits
        (greedy or truncated-temperature — the engine's convention), and
        the initialized draft state. Returns (cache_t, dstate, tok, key)."""
        cache_t, cache_d = self._new_caches()
        cache_t, logits = self._prefill_t(self.params, cache_t, toks, lens)
        if self.ngram is None:
            cache_d, _ = self._prefill_d(self.draft_params, cache_d,
                                         toks, lens)
        key = jax.random.PRNGKey(sampling.seed)
        key, sub = jax.random.split(key)
        if sampling.greedy:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            tok = jax.random.categorical(
                sub, _scaled(logits, sampling.temperature, sampling.top_k,
                             sampling.top_p), axis=-1).astype(jnp.int32)
        dstate = self._init_dstate(cache_d, toks, lens, tok)
        return cache_t, dstate, tok, key

    # -- public API -----------------------------------------------------------

    def generate_scan(
        self,
        prompt_ids: np.ndarray,
        lengths: Sequence[int],
        n_steps: int,
        sampling: SamplingConfig = SamplingConfig(),
    ) -> np.ndarray:
        """Batched speculative generation, entire round loop on device.
        Same contract as InferenceEngine.generate_scan: (B, T) padded
        prompts + true lengths -> (B, n_steps) generated ids (the token
        sampled from the prefill logits is consumed, not emitted)."""
        prompt_ids = np.asarray(prompt_ids)
        if prompt_ids.shape[0] != self.batch_size:
            raise ValueError(f"batch {prompt_ids.shape[0]} != engine "
                             f"batch_size {self.batch_size}")
        if max(lengths) + n_steps > self.max_seq:
            raise ValueError("prompt + n_steps exceeds max_seq")
        toks = jnp.asarray(prompt_ids, jnp.int32)
        lens = jnp.asarray(lengths, jnp.int32)
        cache_t, dstate, tok, key = self._prefill_and_sample(
            toks, lens, sampling)
        loop = self._make_loop(n_steps, sampling.temperature,
                               sampling.top_k, sampling.top_p)
        buf, counts, rounds = loop(self.params, self.draft_params,
                                   cache_t, dstate, tok, key)
        self.last_rounds = int(rounds)
        out = np.asarray(buf)[:, :n_steps]
        # Guards the buffer-clamp overshoot scheme that makes out[:, :n_steps]
        # valid — must survive `python -O`, so not a bare assert.
        if int(np.min(np.asarray(counts))) < n_steps:
            raise RuntimeError(
                "speculative loop under-produced: a lane emitted fewer than "
                f"n_steps={n_steps} tokens — buffer-clamp invariant broken")
        return out

    def generate_iter(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        sampling: SamplingConfig = SamplingConfig(),
        stop_tokens: Sequence[int] = (),
        metrics=None,
    ):
        """Single-sequence streaming generation (the CLI path): one host
        sync per speculative ROUND delivers up to k+1 committed tokens.
        Same visible semantics as InferenceEngine.generate_iter — the
        prefill-sampled token is yielded first, stop/budget checks run per
        round and overshoot is discarded."""
        import time

        from zig_gpt2_tpu.runtime.engine import (GenerationMetrics,
                                                 _drain_stream)

        if self.batch_size != 1:
            raise ValueError("generate_iter is single-sequence")
        prompt_ids = list(prompt_ids)
        if not prompt_ids:
            raise ValueError("prompt must contain at least one token")
        n = len(prompt_ids)
        budget = self.max_seq - n
        steps = budget if max_new_tokens is None else min(max_new_tokens,
                                                          budget)
        metrics = metrics if metrics is not None else GenerationMetrics()
        metrics.prompt_tokens = n

        bucket = next((b for b in self.prompt_buckets if n <= b), None)
        if bucket is None:
            raise ValueError(f"prompt length {n} exceeds the largest bucket "
                             f"{self.prompt_buckets[-1]}")
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = prompt_ids
        t0 = time.perf_counter()
        cache_t, dstate, tok, key = self._prefill_and_sample(
            jnp.asarray(toks), jnp.asarray([n], jnp.int32), sampling)
        first = int(tok[0])  # one sync — like the engine's first token
        metrics.prefill_ms = (time.perf_counter() - t0) * 1000.0

        stops = set(stop_tokens)
        round_ = self._make_round(sampling.temperature, sampling.top_k,
                                  sampling.top_p)
        state = {"carry": (cache_t, dstate, tok, key), "rounds": 0}

        def fetch():
            carry, emit, cnt = round_(self.params, self.draft_params,
                                      state["carry"])
            state["carry"] = carry
            state["rounds"] += 1
            self.last_rounds = state["rounds"]  # streaming telemetry
            # ONE host transfer for both arrays (each dispatched fetch
            # costs a full ~35 ms tunnel round-trip on its own).
            emit_np, cnt_np = jax.device_get((emit, cnt))
            return [int(v) for v in emit_np[0, :int(cnt_np[0])]]

        self.last_rounds = 0
        t_decode = time.perf_counter()
        yield from _drain_stream(first, steps, stops, metrics, fetch)
        metrics.decode_ms = (time.perf_counter() - t_decode) * 1000.0

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        sampling: SamplingConfig = SamplingConfig(),
        stop_tokens: Sequence[int] = (),
        metrics=None,
    ):
        """Collect generate_iter into a list (InferenceEngine.generate's
        contract, sans the on_token callback — iterate generate_iter for
        streaming)."""
        return list(self.generate_iter(prompt_ids, max_new_tokens, sampling,
                                       stop_tokens, metrics=metrics))

    def generate_text(
        self,
        prompt: str,
        encoder,
        max_new_tokens: Optional[int] = None,
        sampling: SamplingConfig = SamplingConfig(),
        stream_to=None,
        metrics=None,
        stop_tokens: Sequence[int] = (),
    ) -> str:
        """Prompt string -> generated string, streaming per round."""
        from zig_gpt2_tpu.runtime.engine import StreamDecoder

        decoder = StreamDecoder(encoder)
        pieces = []
        for tok in self.generate_iter(encoder.encode(prompt), max_new_tokens,
                                      sampling, stop_tokens, metrics=metrics):
            text = decoder.push(tok)
            if text:
                pieces.append(text)
                if stream_to is not None:
                    stream_to.write(text)
                    stream_to.flush()
        tail = decoder.flush()
        if tail:
            pieces.append(tail)
            if stream_to is not None:
                stream_to.write(tail)
                stream_to.flush()
        return "".join(pieces)

    @property
    def acceptance_stats(self) -> Optional[dict]:
        """After a generate_scan: mean emitted tokens per round (ceiling is
        k+1) — the speculative efficiency number for BENCHMARKS.md."""
        if self.last_rounds is None:
            return None
        return {"rounds": self.last_rounds, "k": self.k}

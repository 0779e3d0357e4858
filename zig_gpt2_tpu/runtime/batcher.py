"""Continuous batching: a host-side slot scheduler over one fixed decode batch.

The TPU decode step is a fixed-shape jitted function over a (B, …) KV cache —
re-tracing per request set would be ruinous. So serving keeps ONE cache of B
slots alive forever and streams *requests* through *slots*:

- ``submit`` queues a request; free slots are filled in BUCKET GROUPS: one
  k-sequence bucketed prefill per group whose KV rows are spliced into the
  shared cache at each slot's batch index (k unrolled
  ``dynamic_update_slice`` per leaf, k decomposed into powers of two to
  bound jit variants). A 16-slot cold start is ~2 dispatches, not 16.
- every ``step`` runs ``decode_chunk`` fused decode+sample sub-steps for
  the whole batch on device and syncs one (chunk, B) int32 token block to
  the host, where per-request bookkeeping (stop tokens, budgets,
  retirement, refill) happens. chunk > 1 amortizes the host dispatch+sync
  latency at the cost of chunk-granular stop checks.
- finished slots are immediately refilled from the queue — sequences enter
  and exit without ever stalling the other slots (pad-and-mask slots,
  SURVEY.md §7 hard part 5).

Inactive slots keep decoding garbage that is discarded on the host; their
cache length is reset on retirement, and ``dynamic_update_slice`` clamping
keeps even a long-idle slot in bounds. The reference processes exactly one
prompt per process (main.zig:344-371) — this subsystem is the BASELINE
"continuous batching" extension, new TPU-first design.
"""

from __future__ import annotations

import os
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import cache_formats
from zig_gpt2_tpu.runtime.sampling import sample


@dataclass
class Request:
    rid: int
    prompt_ids: List[int]
    max_new_tokens: Optional[int]
    stop_tokens: frozenset
    generated: List[int] = field(default_factory=list)
    done: bool = False
    # Set while scheduled: slot index and the next token to feed the model.
    slot: Optional[int] = None
    next_token: Optional[int] = None
    # Speculative serve mode: True until the slot's first round emits the
    # prefill-sampled feed token (the normal path emits it as consumed[0]).
    fresh: bool = False
    submitted_at: float = 0.0  # perf_counter at submit (latency metrics)


@dataclass
class BatcherMetrics:
    """Aggregate serving metrics (SURVEY.md §5 observability)."""

    steps: int = 0
    tokens_emitted: int = 0
    prefills: int = 0
    requests_finished: int = 0
    decode_s: float = 0.0          # wall time inside batched decode steps
    prefill_s: float = 0.0         # wall time inside admissions
    occupied_slot_steps: int = 0   # Σ active slots over steps
    prefix_hits: int = 0           # admissions served from the prefix cache
    prefill_tokens_saved: int = 0  # prompt rows NOT recomputed on hits
    spec_rounds: int = 0           # speculative serve: device rounds run
    spec_slot_rounds: int = 0      # … (live slot, round) pairs consumed
    spec_committed: int = 0        # … tokens committed in those pairs
    spec_auto_off_step: Optional[int] = None  # step at which auto-off fired
    sync_ms: List[float] = field(default_factory=list)   # per-dispatch wall
    request_latency_s: List[float] = field(default_factory=list)

    def slot_utilization(self, batch_size: int) -> float:
        return self.occupied_slot_steps / max(self.steps * batch_size, 1)

    def sync_ms_percentile(self, q: float) -> float:
        """p50/p99 of one decode dispatch+sync (the serving latency
        quantum: a streaming client sees one chunk per sync)."""
        if not self.sync_ms:
            return 0.0
        return float(np.percentile(self.sync_ms, q))

    def request_latency_percentile(self, q: float) -> float:
        """p50/p99 submit->finish wall time per request."""
        if not self.request_latency_s:
            return 0.0
        return float(np.percentile(self.request_latency_s, q))

    @property
    def tokens_per_round(self) -> float:
        """Speculative serve acceptance telemetry: committed tokens per
        (live slot, round) — ≈1 means lookup never hits; k+1 is the
        ceiling. Rounds a slot sat retired through (mid-chunk overshoot)
        are excluded from BOTH numerator and denominator, so this is the
        real per-lane acceptance, not garbage-lane self-agreement."""
        return self.spec_committed / max(self.spec_slot_rounds, 1)

    @property
    def tokens_per_sec(self) -> float:
        return self.tokens_emitted / max(self.decode_s, 1e-9)

    def as_dict(self, batch_size: int) -> dict:
        d = {
            "steps": self.steps,
            "tokens_emitted": self.tokens_emitted,
            "prefills": self.prefills,
            "requests_finished": self.requests_finished,
            "decode_s": round(self.decode_s, 4),
            "prefill_s": round(self.prefill_s, 4),
            "tokens_per_sec": round(self.tokens_per_sec, 2),
            "slot_utilization": round(self.slot_utilization(batch_size), 4),
        }
        if self.sync_ms:
            d["sync_ms_p50"] = round(self.sync_ms_percentile(50), 3)
            d["sync_ms_p99"] = round(self.sync_ms_percentile(99), 3)
        if self.request_latency_s:
            d["request_s_p50"] = round(self.request_latency_percentile(50), 4)
            d["request_s_p99"] = round(self.request_latency_percentile(99), 4)
        if self.prefix_hits:
            d["prefix_hits"] = self.prefix_hits
            d["prefill_tokens_saved"] = self.prefill_tokens_saved
        if self.spec_rounds:
            d["spec_rounds"] = self.spec_rounds
            d["tokens_per_round"] = round(self.tokens_per_round, 2)
        if self.spec_auto_off_step is not None:
            d["spec_auto_off_step"] = self.spec_auto_off_step
        return d


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


def _admit_epilogue(cache, rows_cache, logits_last, idxs, feed, key, *, k,
                    config, sampling, spec, hist_cap=0, hist=None,
                    hist_len=None, hist_tokens=None, hist_lens=None):
    """Shared tail of every k-slot admission jit (grouped prefill AND
    grouped prefix-hit — one copy so the two paths cannot drift): splice
    the k computed lanes into the shared cache at their slot indices,
    sample each lane's first token straight into the device-resident feed
    vector, and (speculative serve) seed each slot's token history with
    [prompt..., first] and cursor len+1 (the engine's convention: the
    unprocessed feed token sits at L-1).

    RING cache (config.ring_cache, detected by the ``wptr`` leaf): the
    slot caches are LINEAR (rows [0, n)); each lane is rotated by
    (wptr - n) mod R on its S axis during the splice so its last prompt
    row lands at ring row wptr-1 — the next decode write at wptr then
    continues the lane's interval. start[slot] records the rotation;
    wptr itself is untouched (admissions don't consume ring rows)."""
    ring = "wptr" in cache
    if ring:
        R = cache["k"].shape[-2]
        wptr = cache["wptr"]
        lens = rows_cache["length"]  # (k,) valid rows per admitted lane
        shifts = [(wptr - lens[j]) % R for j in range(k)]
    out = {}
    for name, leaf in cache.items():
        if name == "wptr":
            out[name] = leaf
            continue
        if name == "start":
            for j in range(k):
                leaf = jax.lax.dynamic_update_slice(
                    leaf, shifts[j][None], (idxs[j],))
            out[name] = leaf
            continue
        axis = 0 if name == "length" else 1
        rows = rows_cache[name].astype(leaf.dtype)
        for j in range(k):  # unrolled: k is static, idxs[j] dynamic
            lane = jax.lax.slice_in_dim(rows, j, j + 1, axis=axis)
            if ring and name != "length":
                s_axis = (lane.ndim - 1 if name.endswith("_scale")
                          else lane.ndim - 2)
                lane = jnp.roll(lane, shifts[j], axis=s_axis)
            leaf = jax.lax.dynamic_update_slice_in_dim(
                leaf, lane, idxs[j], axis=axis,
            )
        out[name] = leaf
    key, sub = jax.random.split(key)
    first = sample(logits_last, sub, sampling.temperature, sampling.top_k,
                   sampling.top_p, use_kernel=not config.spmd,
                   mesh=config.mesh if config.spmd else None)
    for j in range(k):
        feed = jax.lax.dynamic_update_slice_in_dim(
            feed, first[j:j + 1], idxs[j], axis=0)
    if not spec:
        return out, feed, key
    hrow = jnp.zeros((k, hist_cap), jnp.int32)
    hrow = jax.lax.dynamic_update_slice(hrow, hist_tokens, (0, 0))
    for j in range(k):
        hrow = jax.lax.dynamic_update_slice(
            hrow, first[j][None, None], (j, hist_lens[j]))
        hist = jax.lax.dynamic_update_slice(hist, hrow[j][None], (idxs[j], 0))
        hist_len = jax.lax.dynamic_update_slice(
            hist_len, hist_lens[j:j + 1] + 1, (idxs[j],))
    return out, feed, key, hist, hist_len


class ContinuousBatcher:
    """Streams requests through a fixed batch of KV-cache slots."""

    def __init__(
        self,
        config: GPTConfig,
        params,
        batch_size: int = 8,
        max_seq: Optional[int] = None,
        prompt_buckets: Optional[Sequence[int]] = None,
        sampling: SamplingConfig = SamplingConfig(),
        kv_quant: Optional[str] = None,
        cache_dtype=None,
        on_token: Optional[Callable[[int, int], None]] = None,
        decode_chunk: int = 1,
        mesh=None,
        speculative: Optional[str] = None,
        spec_k: int = 3,
        spec_ngram: int = 2,
        spec_chunk: int = 1,
        spec_min_tpr: float = 1.5,
    ):
        """``speculative="ngram"``: draft-free prompt-lookup speculation in
        serve mode (VERDICT r03 item 6). Each step runs ``spec_chunk``
        jitted rounds in ONE dispatch — per-slot ngram proposals from the
        token history + one batched (B, k+1) gpt2.extend verify per round —
        instead of a decode chunk, committing 1..spec_k+1 tokens per slot
        per round. Exactness per slot is the standard
        accept/residual-resample law (runtime/speculative.py — the core is
        shared code). No draft model, no second cache: memory cost is one
        (B, ~max_seq) int32 history. Works under a mesh: the round is
        plain jnp, so GSPMD partitions it from the cache/history shardings
        (dp-sharded history, head-sharded cache; the op-level shard_map
        GEMV kernels still apply inside extend — no step-SPMD chunk in
        this mode). decode_chunk must stay 1 (rounds are the sync
        amortizer: spec_chunk rounds x up to k+1 tokens per host
        round-trip, with chunk-granular stop/budget checks like
        decode_chunk).

        ``spec_min_tpr``: speculation AUTO-OFF threshold. Acceptance is a
        workload property, not a config property — the r05 hardware
        session measured the same 1.5B ngram spec serve at +60% on greedy
        repeat traffic (r04) but 0.43x at temperature 0.2 (349.8 vs 814.2
        tok/s, tokens_per_round 1.81): sampling breaks the output loops
        prompt-lookup feeds on. The batcher watches windowed
        tokens-per-round telemetry and permanently falls back to the plain
        decode path when it drops below this threshold (1.5 is
        conservatively below every measured breakeven; 0 disables
        auto-off — A/B runs that must hold the spec path pass 0)."""
        from zig_gpt2_tpu.parallel.mesh import prepare_serving

        self._spec = None
        if speculative is not None:
            if speculative != "ngram":
                raise ValueError(
                    "serve-mode speculation is draft-free prompt lookup "
                    f"only (speculative='ngram'), got {speculative!r}")
            if decode_chunk != 1:
                raise ValueError("speculative serve replaces decode_chunk "
                                 "(a round commits up to spec_k+1 tokens "
                                 "per sync) — leave decode_chunk=1")
            if spec_k < 1:
                raise ValueError("spec_k must be >= 1")
            # (The round-4 batch_size*(spec_k+1) <= 64 guard is gone: the
            # stacked-GEMV kernels now take up to 256 rows —
            # quant.kernels.GEMV_MAX_ROWS — and larger verify windows fall
            # back to the jnp dequant path, slower but correct.)
            self._spec = (spec_k, max(int(spec_ngram), 1),
                          max(int(spec_chunk), 1))

        # Speculative serve under a mesh rides GSPMD: the round is plain
        # jnp (extend + acceptance + history ops), so GSPMD partitions it
        # from the cache/history shardings — no step-SPMD chunk, and the
        # op-level Megatron placement is kept for every leaf.
        params, config = prepare_serving(params, config, mesh, batch_size,
                                         step_spmd_ok=self._spec is None,
                                         kv_quant=kv_quant)
        if self._spec is not None and config.kv_packed:
            # The cache only ever sees prefill + extend in this mode (no
            # decode_step runs), so the packed layout would be pure
            # unpack-view cost — keep it unpacked (the layout table in
            # CLAUDE.md: extend-only caches stay unpacked).
            import dataclasses

            config = dataclasses.replace(config, kv_packed=False)
        # RING cache (GPTConfig.ring_cache): slots decode at divergent
        # positions, so the linear layout pays B unrolled dus appends per
        # array per step (15.4% of the 1.5B B=16 step, hlo_stats r04); the
        # ring write pointer collapses them to ONE batch-spanning dus.
        # Speculative serve extends (not decode-steps) — linear there.
        # Under a mesh, ring rides the step-SPMD body (single-device code
        # per shard, start batch-sharded + wptr replicated) or the plain
        # GSPMD jnp path; only the op-level shard_map attention kernels
        # can't take the start operand. ZG2_RING=0 is the A/B escape.
        ring_ok = self._spec is None
        if ring_ok and mesh is not None:
            from zig_gpt2_tpu.parallel import step_spmd

            ring_ok = (step_spmd.enabled(config)
                       or not gpt2._use_sharded_kernels(config))
        self._ring = ring_ok and os.environ.get("ZG2_RING", "1") != "0"
        if self._ring:
            import dataclasses

            config = dataclasses.replace(config, ring_cache=True)
        self.mesh = mesh
        self.config = config
        self.params = params
        self.batch_size = batch_size
        self.max_seq = max_seq or config.context_size
        self.sampling = sampling
        self.kv_quant = kv_quant
        self.on_token = on_token  # callback(rid, token) for streaming
        # Tokens decoded on-device per host round-trip. >1 amortizes the
        # dispatch+sync latency (essential when the host<->TPU link is slow);
        # stop/budget checks then happen with chunk granularity and a slot
        # retiring mid-chunk discards its remaining chunk tokens.
        self.decode_chunk = max(int(decode_chunk), 1)
        self.prompt_buckets = tuple(
            b for b in (prompt_buckets or (32, 128, 512, config.context_size))
            if b <= self.max_seq
        ) or (self.max_seq,)
        cache_dtype = cache_dtype or params["wte"].dtype

        # decode_chunk-1 extra rows of headroom: a slot that hits its budget
        # mid-chunk keeps consuming garbage rows until the chunk ends
        # (dynamic_update_slice clamps at the edge, but headroom keeps even
        # those writes off real data). Speculative serve instead needs
        # (spec_chunk+1)*(k+1): an active slot can overshoot its budget by
        # up to spec_chunk rounds' verify windows before the host sees it,
        # plus extend's always-on k+1-row headroom contract (idle slots
        # clamp at cache_rows - (k+1) inside the round).
        if self._spec is not None:
            cache_rows = (self.max_seq
                          + (self._spec[2] + 1) * (self._spec[0] + 1))
        else:
            cache_rows = self.max_seq + (self.decode_chunk - 1)
            if self._ring:
                # One extra ring row: a lane's interval must stay < R so
                # the interval mask can never wrap onto the write row
                # (max live interval = max_seq + decode_chunk - 1).
                cache_rows += 1
        self.cache = gpt2.init_kv_cache(
            config, batch_size, cache_rows, dtype=cache_dtype, quant=kv_quant
        )
        # _cache_fmt = jit out_shardings for the shared cache: explicit
        # default layouts single-device, NamedShardings under a mesh.
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from zig_gpt2_tpu.parallel import mesh as pmesh

            shardings = pmesh.cache_shardings(mesh, config, quant=kv_quant)
            # TPU: pin layout AND sharding together (see cache_formats).
            self._cache_fmt = cache_formats(self.cache, shardings) or shardings
            self._data_sharding = NamedSharding(mesh, P(pmesh.DATA_AXIS))
            # Single-slot admission caches are B=1 — the batch axis can't
            # shard over dp>1, so they ride model-sharded/data-replicated.
            # Slot caches are LINEAR even under a ring config (rotated
            # into ring position on splice) — no ring leaves here.
            self._slot_shardings = pmesh.cache_shardings(
                mesh, config, quant=kv_quant, data_sharded=False, ring=False
            )
        else:
            self._cache_fmt = None if config.spmd else cache_formats(self.cache)
            self._slot_shardings = None
        if self._cache_fmt is not None:
            self.cache = jax.tree.map(jax.device_put, self.cache, self._cache_fmt)
        self._key = jax.random.PRNGKey(sampling.seed)

        self._cache_rows = cache_rows
        self._cache_dtype = cache_dtype
        # Jitted k-slot admission fns, keyed by k (see _get_prefill_insert).
        self._prefill_inserts: Dict[int, Any] = {}
        # Prefix cache (register_prefix): [(token tuple, stored B=1 cache)],
        # longest first, plus the jitted register/insert fns.
        self._prefixes: List[tuple] = []
        self._prefix_prefills: Dict[int, Any] = {}
        self._prefix_inserts: Dict[int, Any] = {}

        chunk = self.decode_chunk
        from zig_gpt2_tpu.parallel import step_spmd

        if self._spec is not None:
            from zig_gpt2_tpu.runtime import speculative as spec_mod

            sk, sn, sr = self._spec
            self._hist_cap = self.max_seq + (sr + 1) * (sk + 1)
            len_cap = cache_rows - (sk + 1)
            hw_cap = self._hist_cap - (sk + 1)
            B = batch_size

            def one_round(params, cache, hist, hist_len, tokens, key):
                key, k_acc, k_next = jax.random.split(key, 3)
                ds = spec_mod._propose_ngram(hist, hist_len, tokens,
                                             k=sk, ngram=sn)
                cache, emit, a, nxt = spec_mod._verify_accept_commit(
                    params, config, cache, tokens, ds, None,
                    k_acc, k_next,
                    k=sk, greedy=sampling.temperature == 0.0,
                    temperature=sampling.temperature,
                    top_k=sampling.top_k, top_p=sampling.top_p)
                # Idle-slot clamps: retired slots keep verifying garbage
                # forever; cap their cache length (preserving extend's
                # k+1-row headroom contract) and their history cursor (the
                # tail goes stale — proposals degrade, never corrupt).
                cache = dict(cache,
                             length=jnp.minimum(cache["length"], len_cap))
                hl = jnp.minimum(hist_len, hw_cap)
                for b in range(B):  # per-lane cursor write (B static)
                    hist = jax.lax.dynamic_update_slice(
                        hist, emit[b][None], (b, hl[b]))
                hist_len = jnp.minimum(hist_len + a + 1, hw_cap)
                return cache, hist, hist_len, nxt, key, emit, a + 1

            def spec_chunk_fn(params, cache, hist, hist_len, tokens, key):
                # params is a jit ARG (closure-capturing self.params at
                # trace time would bake the weights in as XLA constants —
                # the axon HTTP-413 trap, CLAUDE.md); the scan body closes
                # over the traced value, never slices it.
                def body(carry, _):
                    cache, hist, hist_len, tok, key = carry
                    cache, hist, hist_len, nxt, key, emit, n = one_round(
                        params, cache, hist, hist_len, tok, key)
                    return (cache, hist, hist_len, nxt, key), (emit, n)

                (cache, hist, hist_len, nxt, key), (emits, ns) = (
                    jax.lax.scan(body, (cache, hist, hist_len, tokens, key),
                                 None, length=sr))
                # tokens rides through as the chunk's first consumed feed
                # token (emitted on a slot's FIRST round — see step()).
                return (cache, hist, hist_len, tokens, emits, ns, nxt, key)

            self._hist = jnp.zeros((batch_size, self._hist_cap), jnp.int32)
            self._hist_len = jnp.zeros((batch_size,), jnp.int32)
            hs2 = hs1 = None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from zig_gpt2_tpu.parallel import mesh as pmesh

                # History rides batch-sharded on the data axis; pin the
                # round's carry outputs so the placement is stable across
                # steps (the same rule as the cache fmt).
                hs2 = NamedSharding(mesh, P(pmesh.DATA_AXIS, None))
                hs1 = NamedSharding(mesh, P(pmesh.DATA_AXIS))
                self._hist = jax.device_put(self._hist, hs2)
                self._hist_len = jax.device_put(self._hist_len, hs1)
            self._hist_fmt = (hs2, hs1)
            self._spec_round = jax.jit(
                spec_chunk_fn, donate_argnums=(1, 2),
                # (cache, hist, hist_len, tokens0, emits, ns, nxt, key)
                out_shardings=(self._cache_fmt, hs2, hs1, hs1,
                               None, None, hs1, None),
            )
        # The PLAIN decode chunk is built even in speculative mode: it is
        # the auto-off fallback (spec_min_tpr; chunk=1 there — spec mode
        # enforces decode_chunk=1). jax.jit is lazy, so the fallback costs
        # nothing unless speculation actually loses. step_spmd never
        # applies under spec (prepare_serving gated it off above).
        if step_spmd.enabled(config):
            # Whole chunk in ONE manual-SPMD region (see parallel/step_spmd).
            decode_sample = step_spmd.make_chunk_fn(
                config, params, kv_quant, chunk, sampling.temperature,
                sampling.top_k, sampling.top_p, emit_consumed=True,
            )
        else:
            def decode_sample(params, cache, tokens, key):
                def body(carry, _):
                    cache, tok, key = carry
                    cache, logits = gpt2.decode_step(params, cache, tok, config)
                    key, sub = jax.random.split(key)
                    nxt = sample(logits, sub, sampling.temperature,
                                 sampling.top_k, sampling.top_p,
                                 use_kernel=not config.spmd,
                                 mesh=config.mesh if config.spmd else None)
                    return (cache, nxt, key), tok  # emit the consumed token

                (cache, nxt, key), consumed = jax.lax.scan(
                    body, (cache, tokens, key), None, length=chunk
                )
                return cache, consumed, nxt, key  # consumed: (chunk, B)

        self._decode = jax.jit(
            decode_sample, donate_argnums=(1, 2),
            out_shardings=(self._cache_fmt, None, None, None),
        )

        self.metrics = BatcherMetrics()
        # Speculation auto-off state (see spec_min_tpr in the docstring):
        # a sliding window of per-sync (live slot-rounds, committed tokens).
        self._spec_min_tpr = float(spec_min_tpr)
        self._spec_off = False
        self._tpr_window: Deque[tuple] = deque(maxlen=8)
        # Per-slot refeed flags, set at the auto-off switch: spec mode's
        # feed token is ALREADY emitted (a round commits what it produces;
        # the feed is the last committed token, its KV row still pending),
        # while the plain path emits what it consumes — so the first plain
        # consume after the switch must drop that token or it would be
        # emitted twice. Cleared at admission (fresh slots follow the
        # plain convention).
        self._refeed = [False] * batch_size
        self.slots: List[Optional[Request]] = [None] * batch_size
        self.queue: Deque[Request] = deque()
        self.finished: List[Request] = []
        self._next_rid = 0
        # Next feed token per slot — lives ON DEVICE: admissions write into
        # it inside prefill_insert and decode chunks return the next vector,
        # so steady state costs one dispatch + one (chunk, B) sync per chunk
        # and admissions cost one dispatch and NO sync.
        self._tokens = jnp.zeros((batch_size,), jnp.int32)
        if self._data_sharding is not None:
            self._tokens = jax.device_put(self._tokens, self._data_sharding)

    # -- client API -----------------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        stop_tokens: Sequence[int] = (),
    ) -> int:
        prompt_ids = list(prompt_ids)
        if not prompt_ids:
            raise ValueError("prompt must contain at least one token")
        if len(prompt_ids) >= self.max_seq:
            raise ValueError(
                f"prompt length {len(prompt_ids)} >= max_seq {self.max_seq}"
            )
        # Admission buckets are a separate cap from max_seq (bench-style
        # custom buckets can sit below it) — reject here, at submit time,
        # instead of raising inside _admit() mid-run and losing every
        # in-flight request.
        if len(prompt_ids) > max(self.prompt_buckets):
            raise ValueError(
                f"prompt length {len(prompt_ids)} exceeds the largest "
                f"prompt bucket {max(self.prompt_buckets)}"
            )
        rid = self._next_rid
        self._next_rid += 1
        self.queue.append(
            Request(rid, prompt_ids, max_new_tokens, frozenset(stop_tokens),
                    submitted_at=time.perf_counter())
        )
        return rid

    def register_prefix(self, prefix_ids: Sequence[int]) -> None:
        """Precompute and keep the KV rows of a shared prompt PREFIX (e.g.
        a system prompt). Later submissions whose prompt shares a leading
        run of tokens with a registered prefix admit by SPLICING the
        stored rows and computing only the suffix (one B=1 ``gpt2.extend``
        — suffix-length FLOPs instead of full-prompt FLOPs). Partial
        overlaps reuse the shared leading rows (causality: row i depends
        only on tokens [0, i]). HBM cost: one slot-sized cache per
        registered prefix. Output is unchanged — admission-path parity is
        pinned by tests/test_batcher_prefix.py."""
        import functools

        prefix_ids = list(prefix_ids)
        if not prefix_ids:
            raise ValueError("prefix must contain at least one token")
        if len(prefix_ids) > max(self.prompt_buckets):
            raise ValueError(
                f"prefix length {len(prefix_ids)} exceeds the largest "
                f"prompt bucket {max(self.prompt_buckets)}")
        n = len(prefix_ids)
        bucket = _bucket(n, self.prompt_buckets)
        fn = self._prefix_prefills.get(bucket)
        if fn is None:
            slot_fmt = self._slot_shardings
            if slot_fmt is None and not self.config.spmd:
                slot_fmt = cache_formats(jax.eval_shape(
                    lambda: gpt2.init_kv_cache(
                        self.config, 1, self._cache_rows,
                        dtype=self._cache_dtype, quant=self.kv_quant,
                        ring=False)))
            fn = jax.jit(
                functools.partial(gpt2.prefill, config=self.config),
                donate_argnums=(1,), out_shardings=(slot_fmt, None))
            self._prefix_prefills[bucket] = fn
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = prefix_ids
        init = gpt2.init_kv_cache(self.config, 1, self._cache_rows,
                                  dtype=self._cache_dtype,
                                  quant=self.kv_quant, ring=False)
        if self._slot_shardings is not None:
            init = jax.device_put(init, self._slot_shardings)
        pre, _ = fn(self.params, init, jnp.asarray(toks),
                    jnp.asarray([n], jnp.int32))
        self._prefixes.append((tuple(prefix_ids), pre))
        self._prefixes.sort(key=lambda t: -len(t[0]))  # longest match first

    def _match_prefix(self, prompt: List[int]):
        """Longest usable stored-prefix overlap for ``prompt``, or None.
        ``usable`` is capped at len(prompt)-1 so at least one suffix token
        remains to produce sampling logits."""
        from zig_gpt2_tpu.runtime.engine import match_prefix

        return match_prefix(self._prefixes, prompt, self.prompt_buckets,
                            self._cache_rows)

    @property
    def pending(self) -> int:
        return len(self.queue) + sum(r is not None for r in self.slots)

    def step(self) -> Dict[int, List[int]]:
        """Admit queued requests, run one batched decode chunk
        (``decode_chunk`` sub-steps on device) — or one speculative round —
        and return {rid: [tokens]} emitted this step."""
        self._admit()
        active = [(i, r) for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return {}
        if self._spec is not None and not self._spec_off:
            return self._step_spec(active)

        t0 = time.perf_counter()
        cache, consumed_dev, self._tokens, self._key = self._decode(
            self.params, self.cache, self._tokens, self._key
        )
        self.cache = cache
        consumed = np.asarray(consumed_dev)  # (chunk, B) — the one host sync
        dt = time.perf_counter() - t0
        self.metrics.decode_s += dt
        self.metrics.sync_ms.append(dt * 1000.0)
        self.metrics.steps += self.decode_chunk
        self.metrics.occupied_slot_steps += len(active) * self.decode_chunk

        emitted: Dict[int, List[int]] = {}
        for i, req in active:
            toks = [int(consumed[j, i])  # token consumed at sub-step j
                    for j in range(self.decode_chunk)]
            if self._refeed[i]:  # spec auto-off: feed was already emitted
                self._refeed[i] = False
                toks = toks[1:]
            self._consume(i, req, toks, emitted)
        return emitted

    def _consume(self, i: int, req: Request, toks: List[int],
                 emitted: Dict[int, List[int]]) -> None:
        """Per-request bookkeeping for a batch of just-produced tokens:
        stop-token check (stops are not emitted), budget/window retirement,
        streaming callback. Overshoot past a retirement is discarded —
        identical semantics for decode chunks and speculative rounds."""
        for fed in toks:
            if fed in req.stop_tokens:
                self._retire(i, req)
                return
            req.generated.append(fed)
            self.metrics.tokens_emitted += 1
            emitted.setdefault(req.rid, []).append(fed)
            if self.on_token is not None:
                self.on_token(req.rid, fed)
            budget_hit = (
                req.max_new_tokens is not None
                and len(req.generated) >= req.max_new_tokens
            )
            full = len(req.prompt_ids) + len(req.generated) >= self.max_seq
            if budget_hit or full:
                self._retire(i, req)
                return

    def _step_spec(self, active) -> Dict[int, List[int]]:
        """One speculative serve step: ``spec_chunk`` rounds of per-slot
        ngram proposals + batched (B, k+1) verify extends, ONE host sync.
        A slot's first step also emits the prefill-sampled feed token (the
        normal path emits it as consumed[0] of the first chunk)."""
        t0 = time.perf_counter()
        (self.cache, self._hist, self._hist_len, consumed0, emits_dev,
         ns_dev, self._tokens, self._key) = self._spec_round(
            self.params, self.cache, self._hist, self._hist_len,
            self._tokens, self._key)
        # emits: (spec_chunk, B, k+1); ns: (spec_chunk, B)
        consumed0, emits, ns = jax.device_get((consumed0, emits_dev, ns_dev))
        rounds = emits.shape[0]
        dt = time.perf_counter() - t0
        self.metrics.decode_s += dt
        self.metrics.sync_ms.append(dt * 1000.0)
        self.metrics.steps += rounds
        self.metrics.occupied_slot_steps += len(active) * rounds
        self.metrics.spec_rounds += rounds

        emitted: Dict[int, List[int]] = {}
        sync_rounds = sync_committed = 0
        for i, req in active:
            if req.fresh:
                req.fresh = False
                self._consume(i, req, [int(consumed0[i])], emitted)
            # Round by round so acceptance telemetry counts only rounds
            # the slot was still live for — a slot retired in round 1 of
            # a chunk keeps committing garbage on device for rounds 2..R,
            # and counting those (garbage lanes often self-accept) would
            # inflate tokens_per_round, the speculation-breakeven number.
            for r in range(rounds):
                if req.done:
                    break
                n = int(ns[r, i])
                self.metrics.spec_slot_rounds += 1
                self.metrics.spec_committed += n
                sync_rounds += 1
                sync_committed += n
                self._consume(i, req,
                              [int(emits[r, i, j]) for j in range(n)],
                              emitted)
        # Speculation auto-off (spec_min_tpr): once the sliding window
        # holds enough evidence, a below-breakeven acceptance rate flips
        # the batcher PERMANENTLY onto the plain decode path — acceptance
        # is workload-determined and a workload that stopped looping
        # rarely starts again; one-way keeps the law simple and the
        # telemetry honest (tokens_per_round stops accumulating garbage).
        if self._spec_min_tpr > 0.0 and not self._spec_off:
            self._tpr_window.append((sync_rounds, sync_committed))
            w_rounds = sum(r for r, _ in self._tpr_window)
            if len(self._tpr_window) >= 4 and w_rounds >= 64:
                if sum(c for _, c in self._tpr_window) < (
                        self._spec_min_tpr * w_rounds):
                    self._spec_off = True
                    self.metrics.spec_auto_off_step = self.metrics.steps
                    for i, req in active:
                        # Slots that ran a spec round have their feed
                        # token already emitted (see _refeed) — unless
                        # still fresh (never stepped) or retired just now.
                        if self.slots[i] is req and not req.fresh:
                            self._refeed[i] = True
        return emitted

    def run(self) -> List[Request]:
        """Drain queue + slots to completion; returns finished requests in
        completion order."""
        while self.pending:
            self.step()
        done, self.finished = self.finished, []
        return done

    # -- internals -------------------------------------------------------------

    def _get_prefill_insert(self, k: int):
        """Jitted k-slot admission fused into ONE dispatch with NO host
        sync: one bucketed k-sequence prefill, k cache splices at the
        slots' batch indices (each slot's length is reset by its splice),
        and the k first tokens sampled straight into the device-resident
        feed vector. k is a static shape — _admit keeps the variant count
        at log2(B) by decomposing free-slot groups into powers of two.

        A 16-slot cold start is thus ~2 dispatches (8+8 or 16) instead of
        16 sequential ones — under a tunneled chip each dispatch costs a
        fixed ~35 ms of link latency, so this is the serve-mode p99 fix."""
        hit = self._prefill_inserts.get(k)
        if hit is not None:
            return hit
        config, sampling = self.config, self.sampling
        spec = self._spec is not None
        hist_cap = self._hist_cap if spec else 0

        def prefill_insert(params, cache, slot_init, tokens, lengths, idxs,
                           feed, key, hist=None, hist_len=None):
            slot_cache, logits = gpt2.prefill(
                params, slot_init, tokens, lengths, config
            )
            return _admit_epilogue(
                cache, slot_cache, logits, idxs, feed, key,
                k=k, config=config, sampling=sampling, spec=spec,
                hist_cap=hist_cap, hist=hist, hist_len=hist_len,
                hist_tokens=tokens, hist_lens=lengths)

        # slot_init is NOT donated: its buffers can't alias the spliced
        # outputs (XLA warns and ignores the donation); the main cache and
        # the feed vector (and the history, spec mode) are.
        fn = jax.jit(
            prefill_insert, donate_argnums=(1, 6) + ((8,) if spec else ()),
            out_shardings=(self._cache_fmt, None, None)
            + (self._hist_fmt if spec else ()),
        )
        self._prefill_inserts[k] = fn
        return fn

    def _get_prefix_insert(self, k: int, sb: int):
        """Jitted k-slot prefix-hit admission, ONE dispatch: broadcast the
        stored B=1 prefix cache to k lanes (per-lane usable row counts —
        partial overlaps share a group), run ONE (k, sb) extend over the
        suffix windows (suffix-length FLOPs — the whole point), splice
        each lane into the shared cache at its slot index, and sample each
        first token from its last valid suffix position. The stored
        prefix cache is NOT donated — it must survive for future hits
        (the broadcast lands in fresh buffers)."""
        hit = self._prefix_inserts.get((k, sb))
        if hit is not None:
            return hit
        config, sampling = self.config, self.sampling
        spec = self._spec is not None

        def prefix_insert(params, cache, pre, bases, toks, slens, idxs,
                          feed, key, hist=None, hist_len=None, prows=None,
                          plens=None):
            prek = {}
            for name, leaf in pre.items():
                axis = 0 if name == "length" else 1
                prek[name] = jnp.repeat(leaf, k, axis=axis)
            prek["length"] = bases  # (k,) per-lane usable rows
            prek2, logits = gpt2.extend(params, prek, toks, slens, config)
            last = jnp.take_along_axis(
                logits, (slens - 1)[:, None, None], axis=1)[:, 0]  # (k, V)
            return _admit_epilogue(
                cache, prek2, last, idxs, feed, key,
                k=k, config=config, sampling=sampling, spec=spec,
                hist_cap=self._hist_cap if spec else 0,
                hist=hist, hist_len=hist_len,
                hist_tokens=prows, hist_lens=plens)

        fn = jax.jit(
            prefix_insert, donate_argnums=(1, 7) + ((9,) if spec else ()),
            out_shardings=(self._cache_fmt, None, None)
            + (self._hist_fmt if spec else ()),
        )
        self._prefix_inserts[(k, sb)] = fn
        return fn

    def _admit_prefix_group(self, pidx: int, sb: int, chunk) -> None:
        """Admit a power-of-two group of prefix-cache hits sharing one
        registered prefix and one suffix bucket in ONE dispatch."""
        t0 = time.perf_counter()
        k = len(chunk)
        pre = self._prefixes[pidx][1]
        toks = np.zeros((k, sb), np.int32)
        bases = np.zeros((k,), np.int32)
        slens = np.zeros((k,), np.int32)
        idxs = np.zeros((k,), np.int32)
        for j, (i, req, usable) in enumerate(chunk):
            suffix = req.prompt_ids[usable:]
            toks[j, :len(suffix)] = suffix
            bases[j] = usable
            slens[j] = len(suffix)
            idxs[j] = i
        args = [
            self.params, self.cache, pre, jnp.asarray(bases),
            jnp.asarray(toks), jnp.asarray(slens), jnp.asarray(idxs),
            self._tokens, self._key,
        ]
        if self._spec is not None:
            prows = np.zeros((k, self._hist_cap), np.int32)
            plens = np.zeros((k,), np.int32)
            for j, (i, req, _u) in enumerate(chunk):
                prows[j, :len(req.prompt_ids)] = req.prompt_ids
                plens[j] = len(req.prompt_ids)
            args += [self._hist, self._hist_len, jnp.asarray(prows),
                     jnp.asarray(plens)]
            (self.cache, self._tokens, self._key,
             self._hist, self._hist_len) = (
                self._get_prefix_insert(k, sb)(*args))
        else:
            self.cache, self._tokens, self._key = (
                self._get_prefix_insert(k, sb)(*args))
        for i, req, usable in chunk:
            req.slot = i
            req.fresh = self._spec is not None
            self._refeed[i] = False
            self.slots[i] = req
            self.metrics.prefix_hits += 1
            self.metrics.prefill_tokens_saved += usable
        self.metrics.prefills += k
        self.metrics.prefill_s += time.perf_counter() - t0

    def _admit(self) -> None:
        free = [i for i in range(self.batch_size) if self.slots[i] is None]
        if not free or not self.queue:
            return
        # Pair queued requests with free slots, grouped by prompt bucket so
        # each group shares one static prefill shape. Prefix-cache hits
        # peel off to their own per-slot suffix-extend admission.
        by_bucket: Dict[int, List[tuple]] = {}
        prefix_groups: Dict[tuple, List[tuple]] = {}
        for i in free:
            if not self.queue:
                break
            req = self.queue.popleft()
            if self._prefixes:
                hit = self._match_prefix(req.prompt_ids)
                if hit is not None:
                    pidx, usable = hit
                    sb = _bucket(len(req.prompt_ids) - usable,
                                 self.prompt_buckets)
                    prefix_groups.setdefault((pidx, sb), []).append(
                        (i, req, usable))
                    continue
            bucket = _bucket(len(req.prompt_ids), self.prompt_buckets)
            by_bucket.setdefault(bucket, []).append((i, req))

        for (pidx, sb), group in prefix_groups.items():
            start = 0
            while start < len(group):  # power-of-two chunks, biggest first
                k = 1 << ((len(group) - start).bit_length() - 1)
                self._admit_prefix_group(pidx, sb, group[start:start + k])
                start += k

        for bucket, group in by_bucket.items():
            # Power-of-two chunks: bounded jit variants, biggest first.
            start = 0
            while start < len(group):
                k = 1 << ((len(group) - start).bit_length() - 1)
                chunk = group[start:start + k]
                start += k
                t0 = time.perf_counter()
                toks = np.zeros((k, bucket), np.int32)
                lens = np.zeros((k,), np.int32)
                idxs = np.zeros((k,), np.int32)
                for j, (i, req) in enumerate(chunk):
                    n = len(req.prompt_ids)
                    toks[j, :n] = req.prompt_ids
                    lens[j] = n
                    idxs[j] = i
                slot_init = gpt2.init_kv_cache(
                    self.config, k, self._cache_rows,
                    dtype=self._cache_dtype, quant=self.kv_quant,
                    ring=False,  # admissions rotate linear lanes on splice
                )
                if self._slot_shardings is not None:
                    slot_init = jax.device_put(slot_init, self._slot_shardings)
                args = (
                    self.params,
                    self.cache,
                    slot_init,
                    jnp.asarray(toks),
                    jnp.asarray(lens),
                    jnp.asarray(idxs),
                    self._tokens,
                    self._key,
                )
                if self._spec is not None:
                    (self.cache, self._tokens, self._key,
                     self._hist, self._hist_len) = self._get_prefill_insert(
                        k)(*args, self._hist, self._hist_len)
                else:
                    self.cache, self._tokens, self._key = (
                        self._get_prefill_insert(k)(*args))
                for i, req in chunk:
                    req.slot = i
                    req.fresh = self._spec is not None
                    self._refeed[i] = False
                    self.slots[i] = req
                self.metrics.prefills += k
                self.metrics.prefill_s += time.perf_counter() - t0

    def _retire(self, slot: int, req: Request) -> None:
        # No device work: an idle slot keeps decoding garbage that the host
        # discards (dynamic_update_slice clamping keeps it in bounds), and
        # the next admission's cache splice resets its length.
        req.done = True
        req.slot = None
        self.slots[slot] = None
        self.metrics.requests_finished += 1
        if req.submitted_at:
            self.metrics.request_latency_s.append(
                time.perf_counter() - req.submitted_at)
        self.finished.append(req)

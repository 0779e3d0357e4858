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

    def slot_utilization(self, batch_size: int) -> float:
        return self.occupied_slot_steps / max(self.steps * batch_size, 1)

    @property
    def tokens_per_sec(self) -> float:
        return self.tokens_emitted / max(self.decode_s, 1e-9)

    def as_dict(self, batch_size: int) -> dict:
        return {
            "steps": self.steps,
            "tokens_emitted": self.tokens_emitted,
            "prefills": self.prefills,
            "requests_finished": self.requests_finished,
            "decode_s": round(self.decode_s, 4),
            "prefill_s": round(self.prefill_s, 4),
            "tokens_per_sec": round(self.tokens_per_sec, 2),
            "slot_utilization": round(self.slot_utilization(batch_size), 4),
        }


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


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
    ):
        from zig_gpt2_tpu.parallel.mesh import prepare_serving

        params, config = prepare_serving(params, config, mesh, batch_size)
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
        # those writes off real data).
        cache_rows = self.max_seq + (self.decode_chunk - 1)
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
            self._slot_shardings = pmesh.cache_shardings(
                mesh, config, quant=kv_quant, data_sharded=False
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

        chunk = self.decode_chunk
        from zig_gpt2_tpu.parallel import step_spmd

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
            Request(rid, prompt_ids, max_new_tokens, frozenset(stop_tokens))
        )
        return rid

    @property
    def pending(self) -> int:
        return len(self.queue) + sum(r is not None for r in self.slots)

    def step(self) -> Dict[int, List[int]]:
        """Admit queued requests, run one batched decode chunk
        (``decode_chunk`` sub-steps on device), return {rid: [tokens]}
        emitted this step."""
        self._admit()
        active = [(i, r) for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return {}

        t0 = time.perf_counter()
        cache, consumed_dev, self._tokens, self._key = self._decode(
            self.params, self.cache, self._tokens, self._key
        )
        self.cache = cache
        consumed = np.asarray(consumed_dev)  # (chunk, B) — the one host sync
        self.metrics.decode_s += time.perf_counter() - t0
        self.metrics.steps += self.decode_chunk
        self.metrics.occupied_slot_steps += len(active) * self.decode_chunk

        emitted: Dict[int, List[int]] = {}
        for i, req in active:
            for j in range(self.decode_chunk):
                fed = int(consumed[j, i])  # token consumed at sub-step j
                if fed in req.stop_tokens:  # stop tokens are not emitted
                    self._retire(i, req)
                    break
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
                    break
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

        def prefill_insert(params, cache, slot_init, tokens, lengths, idxs,
                           feed, key):
            slot_cache, logits = gpt2.prefill(
                params, slot_init, tokens, lengths, config
            )
            out = {}
            for name, leaf in cache.items():
                axis = 0 if name == "length" else 1
                rows = slot_cache[name].astype(leaf.dtype)
                for j in range(k):  # unrolled: k is static, idxs[j] dynamic
                    leaf = jax.lax.dynamic_update_slice_in_dim(
                        leaf,
                        jax.lax.slice_in_dim(rows, j, j + 1, axis=axis),
                        idxs[j], axis=axis,
                    )
                out[name] = leaf
            key, sub = jax.random.split(key)
            first = sample(logits, sub, sampling.temperature,
                           sampling.top_k, sampling.top_p,
                           use_kernel=not config.spmd,
                           mesh=config.mesh if config.spmd else None)
            for j in range(k):
                feed = jax.lax.dynamic_update_slice_in_dim(
                    feed, first[j:j + 1], idxs[j], axis=0
                )
            return out, feed, key

        # slot_init is NOT donated: its buffers can't alias the spliced
        # outputs (XLA warns and ignores the donation); the main cache and
        # the feed vector are.
        fn = jax.jit(
            prefill_insert, donate_argnums=(1, 6),
            out_shardings=(self._cache_fmt, None, None),
        )
        self._prefill_inserts[k] = fn
        return fn

    def _admit(self) -> None:
        free = [i for i in range(self.batch_size) if self.slots[i] is None]
        if not free or not self.queue:
            return
        # Pair queued requests with free slots, grouped by prompt bucket so
        # each group shares one static prefill shape.
        by_bucket: Dict[int, List[tuple]] = {}
        for i in free:
            if not self.queue:
                break
            req = self.queue.popleft()
            bucket = _bucket(len(req.prompt_ids), self.prompt_buckets)
            by_bucket.setdefault(bucket, []).append((i, req))

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
                )
                if self._slot_shardings is not None:
                    slot_init = jax.device_put(slot_init, self._slot_shardings)
                self.cache, self._tokens, self._key = self._get_prefill_insert(k)(
                    self.params,
                    self.cache,
                    slot_init,
                    jnp.asarray(toks),
                    jnp.asarray(lens),
                    jnp.asarray(idxs),
                    self._tokens,
                    self._key,
                )
                for i, req in chunk:
                    req.slot = i
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
        self.finished.append(req)

"""Generation runtime: streaming KV-cached decode.

The TPU re-design of the reference's generate loop (main.zig:322-342):

- Prefill consumes the whole prompt in one jitted pass (vs. 1 token/step).
- The steady-state step is ONE jitted function ``(params, cache, token, key)
  -> (cache, token, key)`` — decode + temperature/top-k sampling fused on
  device, cache donated, so the host round-trip per token is a single int32
  (needed only because we stream text, like the reference streams to stderr
  at main.zig:339-340).
- For throughput benchmarking there is also ``generate_scan``: the whole
  token loop as one ``lax.scan`` on device — zero host involvement.
- Prompts are bucketed to a few static lengths so jit re-traces are bounded.
- Stop-token handling and max_new_tokens are supported (the reference always
  runs to the full 1024 window, main.zig:330 — a documented quirk, available
  here as ``max_new_tokens=None``).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import GPTConfig, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.sampling import sample


def cache_formats(cache_template, shardings=None):
    """Explicit DEFAULT-layout formats for the KV-cache leaves (TPU).
    XLA's layout assignment otherwise picks an S-minor entry/exit layout
    for the (…, S, D=64) caches (it minimizes tile padding) while the loop
    body needs the default D-minor layout for the Pallas custom calls —
    producing full-cache relayout copies at every step boundary (measured
    47% of the 1.5B B=16 step). Pinning the boundary to the default layout
    deletes them. ``shardings``: an optional NamedSharding tree (mesh
    serving) — the Format then pins layout AND sharding together.
    Returns None off-TPU."""
    if jax.default_backend() != "tpu":
        return None
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    if shardings is None:
        sh = SingleDeviceSharding(jax.devices()[0])
        shardings = jax.tree.map(lambda x: sh, cache_template)
    return jax.tree.map(
        lambda x, s: Format(Layout(major_to_minor=tuple(range(x.ndim))), s),
        cache_template,
        shardings,
    )


class StreamDecoder:
    """Incremental detokenizer that never emits partial UTF-8 sequences.

    The reference decodes and prints each token immediately (main.zig:339-340)
    — safe there only because its 20-byte scratch decode is per-token. Byte-
    level BPE tokens can split multi-byte UTF-8 characters, so we buffer
    incomplete tails.
    """

    def __init__(self, encoder):
        self.encoder = encoder
        self._pending = b""

    def push(self, token_id: int) -> str:
        data = self._pending + self.encoder.decode_bytes([token_id])
        # Find the longest prefix that is complete UTF-8.
        for cut in range(len(data), max(len(data) - 4, -1), -1):
            try:
                text = data[:cut].decode("utf-8")
            except UnicodeDecodeError:
                continue
            self._pending = data[cut:]
            return text
        self._pending = data
        return ""

    def flush(self) -> str:
        text = self._pending.decode("utf-8", errors="replace")
        self._pending = b""
        return text


@dataclass
class GenerationMetrics:
    """Per-request metrics (SURVEY.md §5 observability)."""

    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_ms: float = 0.0
    decode_ms: float = 0.0
    per_token_ms: List[float] = field(default_factory=list)
    prefix_tokens_reused: int = 0  # prompt rows served from the prefix cache

    @property
    def ms_per_token(self) -> float:
        return self.decode_ms / max(self.generated_tokens, 1)

    @property
    def tokens_per_sec(self) -> float:
        return 1000.0 * self.generated_tokens / max(self.decode_ms, 1e-9)

    def ms_per_token_percentile(self, q: float) -> float:
        if not self.per_token_ms:
            return 0.0
        return float(np.percentile(self.per_token_ms, q))


def _drain_stream(first: int, steps: int, stops, metrics: GenerationMetrics,
                  fetch: Callable[[], List[int]], first_ms: float = 0.0):
    """The shared streaming drain loop (engine chunked path + speculative
    generate_iter — one copy so their visible semantics cannot diverge):
    yield tokens batch by batch, enforcing the step budget and the stop
    set at token granularity (the stop token itself is not yielded,
    overshoot past the budget is discarded). ``fetch()`` returns the next
    batch from ONE device round-trip; each batch's wall time is amortized
    over its tokens into metrics.per_token_ms (recorded only for YIELDED
    tokens, so percentiles track generated_tokens)."""
    pending = [first]
    pending_ms = first_ms
    emitted = 0
    while True:
        for t in pending:
            if emitted >= steps or t in stops:
                return
            metrics.generated_tokens += 1
            metrics.per_token_ms.append(pending_ms)
            emitted += 1
            yield t
        if emitted >= steps:
            return
        t1 = time.perf_counter()
        pending = fetch()
        pending_ms = (time.perf_counter() - t1) * 1000.0 / max(len(pending), 1)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds the largest bucket {buckets[-1]}")


def match_prefix(prefixes, prompt, buckets, cache_rows):
    """Longest usable stored-prefix overlap for ``prompt``: returns
    (prefix index, usable row count) or None. Shared by InferenceEngine
    and ContinuousBatcher (one matching policy). ``usable`` is capped at
    len(prompt)-1 (at least one suffix token must remain to produce
    sampling logits) and shrunk until the BUCKET-padded suffix window
    fits ``cache_rows`` — the suffix extend writes a full bucket at row
    ``usable``, and the update-slice clamp would otherwise shift it
    backward over valid prefix rows. Each shrink can only grow the
    bucket, so the loop terminates."""
    best = None
    for pidx, (ptoks, _pre) in enumerate(prefixes):
        cap = min(len(ptoks), len(prompt) - 1)
        k = 0
        while k < cap and prompt[k] == ptoks[k]:
            k += 1
        while k >= 1:
            sb = _bucket(len(prompt) - k, buckets)
            if k + sb <= cache_rows:
                break
            k = cache_rows - sb
        if k >= 1 and (best is None or k > best[1]):
            best = (pidx, k)
    return best


class InferenceEngine:
    """Single-model generation engine: owns the jitted prefill / fused
    decode+sample steps and the donated KV cache."""

    def __init__(
        self,
        config: GPTConfig,
        params,
        encoder=None,
        batch_size: int = 1,
        max_seq: Optional[int] = None,
        prompt_buckets: Optional[Sequence[int]] = None,
        kv_quant: Optional[str] = None,
        cache_dtype: Optional[jnp.dtype] = None,
        mesh=None,
        decode_chunk: Optional[int] = None,
    ):
        """``mesh``: a (data, model) jax.sharding.Mesh for sharded serving.
        If ``config.spmd`` is not already set (params not yet padded/placed
        — e.g. cli.py does it before quantizing), the engine pads + shards
        them itself via parallel.mesh.prepare_params. batch_size must
        divide the data axis.

        ``decode_chunk``: tokens decoded on device per host round-trip in
        the streaming path (generate_iter). Each sync costs a full host
        round-trip (~35 ms through a tunneled chip — ~97%% of streaming
        latency there), so chunking is the difference between streaming at
        the chip's speed and at the link's. Stop-token checks happen at
        chunk granularity and overshoot is discarded, so visible output is
        unchanged; the cache carries decode_chunk-1 rows of headroom for
        the discarded steps (same scheme as ContinuousBatcher). Default: 8
        on TPU, 1 elsewhere (CPU tests keep per-token semantics)."""
        from zig_gpt2_tpu.parallel.mesh import prepare_serving

        params, config = prepare_serving(params, config, mesh, batch_size,
                                         kv_quant=kv_quant)
        self.mesh = mesh
        self.config = config
        self.params = params
        self.encoder = encoder
        self.batch_size = batch_size
        self.max_seq = max_seq or config.context_size
        self.prompt_buckets = tuple(
            b for b in (prompt_buckets or (32, 128, 512, config.context_size))
            if b <= self.max_seq
        ) or (self.max_seq,)
        self.kv_quant = kv_quant
        if decode_chunk is None:
            decode_chunk = 8 if jax.default_backend() == "tpu" else 1
        self.decode_chunk = max(int(decode_chunk), 1)
        # Headroom rows for chunk overshoot (see decode_chunk docstring).
        self._cache_rows = self.max_seq + (self.decode_chunk - 1)
        # wte is always a float leaf even when the linears are quantized.
        self.cache_dtype = cache_dtype or params["wte"].dtype
        self._step_cache: dict = {}  # jitted step fns, keyed by sampling cfg
        # Prefix cache (register_prefix): [(token tuple, stored cache)],
        # longest first, + the jitted suffix-extend fns keyed by bucket.
        self._prefixes: list = []
        self._prefix_fns: dict = {}
        # _cache_fmt doubles as the jit out_shardings for the cache: explicit
        # default layouts single-device (see cache_formats) and NamedShardings
        # under a mesh (pinning the sharded layout stable across steps).
        self._cache_fmt = None
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from zig_gpt2_tpu.parallel import mesh as pmesh

            shardings = pmesh.cache_shardings(mesh, config, quant=kv_quant)
            # On TPU, pin layout AND sharding together (see cache_formats);
            # plain NamedShardings elsewhere.
            self._cache_fmt = cache_formats(
                jax.eval_shape(
                    lambda: gpt2.init_kv_cache(
                        config, batch_size, self._cache_rows,
                        dtype=self.cache_dtype, quant=kv_quant,
                    )
                ),
                shardings,
            ) or shardings
            self._data_sharding = {
                1: NamedSharding(mesh, P(pmesh.DATA_AXIS)),
                2: NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
            }
        elif not config.spmd:
            self._cache_fmt = cache_formats(
                jax.eval_shape(
                    lambda: gpt2.init_kv_cache(
                        config, batch_size, self._cache_rows,
                        dtype=self.cache_dtype, quant=kv_quant,
                    )
                )
            )
        self._prefill = jax.jit(
            functools.partial(gpt2.prefill, config=config),
            donate_argnums=(1,),
            out_shardings=(self._cache_fmt, None),
        )

    def _put_data(self, arr: jax.Array) -> jax.Array:
        """Place a (B,) / (B, T) host array batch-sharded on the data axis
        (no-op single-device)."""
        if self._data_sharding is None:
            return arr
        return jax.device_put(arr, self._data_sharding[arr.ndim])

    def new_cache(self) -> gpt2.KVCache:
        cache = gpt2.init_kv_cache(
            self.config,
            self.batch_size,
            self._cache_rows,
            dtype=self.cache_dtype,
            quant=self.kv_quant,
        )
        if self._cache_fmt is not None:
            cache = jax.tree.map(jax.device_put, cache, self._cache_fmt)
        return cache

    def _make_chunk(self, n: int, temperature: float, top_k: Optional[int],
                    top_p: Optional[float], uniform: bool = False):
        """The jitted n-step decode+sample chunk — the ONE steady-state
        compute function behind every generation path: ``(params, cache,
        token, key) -> (cache, toks (n, B), token, key)``, cache donated.

        Under a mesh with the step-level SPMD path enabled
        (parallel.step_spmd.enabled) the whole chunk body runs inside ONE
        shard_map with manual Megatron collectives — single-device Pallas
        kernels per shard, no per-op region fences. Otherwise the body is
        the plain decode_step + sample scan (fused single-device kernels,
        or GSPMD/op-level shard_map per the config).

        ``uniform``: the caller proves every batch lane decodes at the SAME
        position (equal-length prompts, or batch_size == 1) — the cache
        appends then collapse to one batch-spanning dus per array
        (config.uniform_pos; 15.4% of the 1.5B B=16 step was unrolled
        appends). The ContinuousBatcher never uses this (slots admit at
        different positions).

        (Cached in a per-instance dict, not functools.lru_cache — a global
        lru_cache on an instance method pins the engine and its donated
        cache alive for the process lifetime.)"""
        import dataclasses
        import os

        # A/B escape: ZG2_UNIFORM_POS=0 keeps the per-lane unrolled appends
        # even when the caller proved the positions uniform.
        uniform = uniform and os.environ.get("ZG2_UNIFORM_POS", "1") != "0"
        cache_key = ("chunk", n, temperature, top_k, top_p, uniform)
        hit = self._step_cache.get(cache_key)
        if hit is not None:
            return hit
        from zig_gpt2_tpu.parallel import step_spmd

        config = (dataclasses.replace(self.config, uniform_pos=True)
                  if uniform else self.config)
        if step_spmd.enabled(config):
            run = step_spmd.make_chunk_fn(
                config, self.params, self.kv_quant, n,
                temperature, top_k, top_p,
            )
        else:
            use_kernel = not config.spmd
            mesh = config.mesh if config.spmd else None

            def run(params, cache, token, key):
                def body(carry, _):
                    cache, token, key = carry
                    cache, logits = gpt2.decode_step(params, cache, token,
                                                     config)
                    key, sub = jax.random.split(key)
                    token = sample(logits, sub, temperature, top_k, top_p,
                                   use_kernel=use_kernel, mesh=mesh)
                    return (cache, token, key), token

                (cache, token, key), toks = jax.lax.scan(
                    body, (cache, token, key), None, length=n
                )
                return cache, toks, token, key

        fn = jax.jit(run, donate_argnums=(1,),
                     out_shardings=(self._cache_fmt, None, None, None))
        self._step_cache[cache_key] = fn
        return fn

    def _sample_step(self, temperature: float, top_k: Optional[int],
                     top_p: Optional[float]):
        """Single decode+sample step ``(params, cache, token, key) ->
        (cache, token, key)`` — the n=1 chunk with the (n, B) token trace
        dropped."""
        # Key includes the ZG2_UNIFORM_POS-resolved uniform flag like
        # _make_chunk's key does (advisor r04): flipping the env var
        # mid-process must not return a stale closure.
        import os

        uniform = os.environ.get("ZG2_UNIFORM_POS", "1") != "0"
        cache_key = ("step1", temperature, top_k, top_p, uniform)
        hit = self._step_cache.get(cache_key)
        if hit is not None:
            return hit
        # Single-sequence by construction (generate_iter asserts B == 1),
        # so the shared-position append fast path always applies.
        run = self._make_chunk(1, temperature, top_k, top_p, uniform=True)

        def step(params, cache, token, key):
            cache, _, token, key = run(params, cache, token, key)
            return cache, token, key

        self._step_cache[cache_key] = step
        return step

    # -- streaming generation -------------------------------------------------

    def register_prefix(self, prefix_ids: Sequence[int]) -> None:
        """Precompute and keep the KV rows of a shared prompt prefix (a
        system prompt): later ``generate``/``generate_iter`` calls whose
        prompt shares a leading token run start from the stored rows and
        prefill only their suffix (one extend — suffix-length FLOPs).
        Pays off on REPEATED calls on one engine; output is unchanged
        (tests/test_engine_prefix.py pins parity). Single-sequence
        (batch_size == 1; the batcher has the multi-slot variant)."""
        if self.batch_size != 1:
            raise ValueError("register_prefix is single-sequence "
                             "(batch_size == 1); use ContinuousBatcher")
        prefix_ids = list(prefix_ids)
        if not prefix_ids:
            raise ValueError("prefix must contain at least one token")
        n = len(prefix_ids)
        bucket = _bucket(n, self.prompt_buckets)  # raises if too long
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = prefix_ids
        pre, _ = self._prefill(
            self.params, self.new_cache(),
            self._put_data(jnp.asarray(toks)),
            self._put_data(jnp.asarray([n], jnp.int32)))
        self._prefixes.append((tuple(prefix_ids), pre))
        self._prefixes.sort(key=lambda t: -len(t[0]))

    def _prefix_prefill(self, prompt_ids, pidx: int, usable: int):
        """Prefix-hit prefill: suffix-only extend from the stored rows.
        The stored cache is NOT donated (it must survive for future
        hits); extend's result lands in fresh buffers that become this
        call's working cache. Returns (cache, last-position logits)."""
        suffix = prompt_ids[usable:]
        sb = _bucket(len(suffix), self.prompt_buckets)
        fn = self._prefix_fns.get(sb)
        if fn is None:
            config = self.config

            def prefix_prefill(params, pre, base, toks, slen):
                pre = dict(pre, length=base)
                cache, logits = gpt2.extend(params, pre, toks, slen, config)
                last = jnp.take_along_axis(
                    logits, (slen - 1)[:, None, None], axis=1)[:, 0]
                return cache, last

            fn = jax.jit(prefix_prefill,
                         out_shardings=(self._cache_fmt, None))
            self._prefix_fns[sb] = fn
        toks = np.zeros((1, sb), np.int32)
        toks[0, :len(suffix)] = suffix
        return fn(self.params, self._prefixes[pidx][1],
                  jnp.asarray([usable], jnp.int32),
                  self._put_data(jnp.asarray(toks)),
                  self._put_data(jnp.asarray([len(suffix)], jnp.int32)))

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        sampling: SamplingConfig = SamplingConfig(),
        stop_tokens: Sequence[int] = (),
        on_token: Optional[Callable[[int], None]] = None,
        metrics: Optional[GenerationMetrics] = None,
    ) -> List[int]:
        """Generate from a single prompt, streaming tokens via ``on_token``.

        Reference behavior (main.zig:322-342) is max_new_tokens=None: run to
        the end of the context window with no stop handling.
        """
        out: List[int] = []
        for tok in self.generate_iter(
            prompt_ids, max_new_tokens, sampling, stop_tokens, metrics
        ):
            if on_token is not None:
                on_token(tok)
            out.append(tok)
        return out

    def generate_iter(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: Optional[int] = None,
        sampling: SamplingConfig = SamplingConfig(),
        stop_tokens: Sequence[int] = (),
        metrics: Optional[GenerationMetrics] = None,
    ) -> Iterator[int]:
        if self.batch_size != 1:
            raise ValueError("generate_iter is single-sequence; use ContinuousBatcher")
        prompt_ids = list(prompt_ids)
        if not prompt_ids:
            raise ValueError("prompt must contain at least one token")
        n = len(prompt_ids)
        budget = self.max_seq - n
        steps = budget if max_new_tokens is None else min(max_new_tokens, budget)
        metrics = metrics if metrics is not None else GenerationMetrics()
        metrics.prompt_tokens = n

        # Padded, bucketed prefill — or a prefix-cache hit's suffix extend.
        t0 = time.perf_counter()
        hit = (match_prefix(self._prefixes, prompt_ids, self.prompt_buckets,
                            self._cache_rows) if self._prefixes else None)
        if hit is not None:
            cache, logits = self._prefix_prefill(prompt_ids, *hit)
            metrics.prefix_tokens_reused = hit[1]
        else:
            bucket = _bucket(n, self.prompt_buckets)
            tokens = np.zeros((1, bucket), np.int32)
            tokens[0, :n] = prompt_ids
            cache, logits = self._prefill(
                self.params,
                self.new_cache(),
                self._put_data(jnp.asarray(tokens)),
                self._put_data(jnp.asarray([n], jnp.int32)),
            )
        key = jax.random.PRNGKey(sampling.seed)
        key, sub = jax.random.split(key)
        token = sample(logits, sub, sampling.temperature, sampling.top_k,
                       sampling.top_p, use_kernel=not self.config.spmd,
                       mesh=self.config.mesh if self.config.spmd else None)
        token.block_until_ready()
        metrics.prefill_ms = (time.perf_counter() - t0) * 1000.0

        stops = set(stop_tokens)
        t_decode = time.perf_counter()
        if self.decode_chunk == 1:
            step = self._sample_step(sampling.temperature, sampling.top_k,
                                     sampling.top_p)
            for _ in range(steps):
                t1 = time.perf_counter()
                tok_host = int(token[0])  # one host sync per token
                if tok_host in stops:
                    break
                cache, token, key = step(self.params, cache, token, key)
                metrics.generated_tokens += 1
                metrics.per_token_ms.append((time.perf_counter() - t1) * 1000.0)
                yield tok_host
            metrics.decode_ms = (time.perf_counter() - t_decode) * 1000.0
            return

        # Chunked streaming: decode_chunk tokens per dispatch+sync — the
        # per-token host round-trip (35 ms through a tunneled chip vs ~1 ms
        # of compute at 124M) amortizes chunk-fold. Stop/budget checks run
        # host-side per chunk; overshoot steps write only headroom rows and
        # their tokens are never yielded, so visible output is identical to
        # the per-token loop.
        runner = self._make_chunk(self.decode_chunk, sampling.temperature,
                                  sampling.top_k, sampling.top_p,
                                  uniform=True)  # B == 1 (asserted above)
        t1 = time.perf_counter()
        first = int(token[0])  # the first sampled token (one sync)
        first_ms = (time.perf_counter() - t1) * 1000.0
        state = {"cache": cache, "token": token, "key": key}

        def fetch():
            state["cache"], toks, state["token"], state["key"] = runner(
                self.params, state["cache"], state["token"], state["key"])
            arr = np.asarray(toks)[:, 0]  # (chunk,) — one sync per chunk
            return [int(v) for v in arr]

        yield from _drain_stream(first, steps, stops, metrics, fetch,
                                 first_ms=first_ms)
        metrics.decode_ms = (time.perf_counter() - t_decode) * 1000.0

    def generate_text(
        self,
        prompt: str,
        max_new_tokens: Optional[int] = None,
        sampling: SamplingConfig = SamplingConfig(),
        stream_to=None,
        metrics: Optional[GenerationMetrics] = None,
        stop_tokens: Sequence[int] = (),
    ) -> str:
        """Prompt string -> generated string, optionally streaming each
        chunk to a file-like object as it is produced (the reference streams
        to stderr, main.zig:340)."""
        if self.encoder is None:
            raise ValueError("engine constructed without a tokenizer")
        ids = self.encoder.encode(prompt)
        decoder = StreamDecoder(self.encoder)
        pieces: List[str] = []

        for tok in self.generate_iter(
            ids, max_new_tokens, sampling, stop_tokens, metrics=metrics
        ):
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

    # -- fully-on-device generation (benchmark / batch path) ------------------

    def generate_scan(
        self,
        prompt_ids: np.ndarray,
        lengths: Sequence[int],
        n_steps: int,
        sampling: SamplingConfig = SamplingConfig(),
    ) -> np.ndarray:
        """Batched generation with the entire token loop on device.

        Args:
          prompt_ids: (B, T) padded prompts.  lengths: true lengths.
        Returns (B, n_steps) generated ids.
        """
        cache, logits = self._prefill(
            self.params,
            self.new_cache(),
            self._put_data(jnp.asarray(prompt_ids, jnp.int32)),
            self._put_data(jnp.asarray(lengths, jnp.int32)),
        )
        key = jax.random.PRNGKey(sampling.seed)
        key, sub = jax.random.split(key)
        token = sample(logits, sub, sampling.temperature, sampling.top_k,
                       sampling.top_p, use_kernel=not self.config.spmd,
                       mesh=self.config.mesh if self.config.spmd else None)
        # Equal-length prompts keep every lane at one shared position for
        # the whole scan -> batch-spanning single-dus cache appends.
        uniform = len({int(x) for x in lengths}) == 1
        run = self._make_chunk(n_steps, sampling.temperature,
                               sampling.top_k, sampling.top_p,
                               uniform=uniform)
        _, tokens, _, _ = run(self.params, cache, token, key)
        return np.asarray(tokens).T  # tokens: (n_steps, B)

"""Model configuration for the GPT-2 family.

The reference hardcodes one config — ``GPTConfig.init(50257, 1024, 12, 12, 768)``
at main.zig:346 — and one sampling temperature (0.8, main.zig:345). Here the
whole GPT-2 family is first-class (124M/355M/774M/1.5B per BASELINE.json
configs), plus tiny configs for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """Architecture hyperparameters for a GPT-2 style decoder-only model."""

    vocab_size: int = 50257
    context_size: int = 1024
    n_layers: int = 12
    n_heads: int = 12
    n_embed: int = 768
    layer_norm_eps: float = 1e-5
    # Sharding-driven padding (zig_gpt2_tpu.parallel.sharding.pad_for_tp).
    # GPT-2 dims don't always divide the mesh: 1.5B has 25 heads and every
    # size has vocab 50257. Padded attention heads are mathematically inert
    # (zero c_attn columns + zero c_proj rows); padded vocab logits are
    # masked to MASK_VALUE before sampling. None = unpadded.
    padded_heads: Optional[int] = None
    padded_vocab_size: Optional[int] = None
    # True when the model runs GSPMD-sharded over a mesh (set by
    # parallel.sharding.pad_for_tp). Pallas custom calls cannot be
    # partitioned by GSPMD; with ``mesh`` set the hot kernels run
    # per-shard under op-level shard_map (parallel/shard_kernels.py),
    # otherwise dispatch falls back to the jnp formulations, which
    # partition head-/column-parallel for free.
    spmd: bool = False
    # The (data, model) jax.sharding.Mesh for the shard_map kernel path.
    # Optional: hashable, compares by device assignment, and is carried in
    # the config (not threaded per-call) because kernel dispatch sites sit
    # inside scan bodies that only see the config. None = no shard_map.
    mesh: Optional[object] = None
    # Prefill sequence parallelism (SURVEY §2.3 SP): shard the residual
    # stream's sequence axis over the model mesh axis during prefill, so
    # LayerNorm/GELU/residual work and activation memory split tp-ways;
    # GSPMD inserts the all-gather before each matmul and reduce-scatters
    # after (same wire volume as the TP all-reduce it replaces). Decode has
    # seq=1 — SP is prefill-only by construction.
    seq_parallel: bool = False
    # Head-pair-PACKED KV cache layout: (L, B, H/2, S, 2D) with adjacent
    # heads sharing one 128-lane row; INT8 scales are per-PAIR, planes
    # (L, B, H/2, S). Kills the D=64 half-empty-lane waste in the fused
    # decode-attention kernel's f32 temporaries (~2x its VPU work — see
    # ops/attention._build_kernel_packed). Set by the runtime when the
    # fused single-device kernel path is active (models.gpt2
    # default_kv_packed); odd head counts ride a zero phantom head padded
    # per step. Cache layout + dispatch both key off this flag, so it must
    # be set before init_kv_cache / jit.
    kv_packed: bool = False
    # Set ONLY inside the step-level shard_map body (parallel/step_spmd):
    # the mesh axis name over which the model code must insert its own
    # collectives (psum after row-parallel projections, masked-lookup psum
    # at the embedding, cross-shard argmax in the sampler). The body runs
    # the single-device code paths (spmd=False, mesh=None) on per-shard
    # shapes; this field is what tells them the shapes are shards.
    manual_axis: Optional[str] = None
    # All batch lanes share ONE decode position (proved by the caller:
    # equal-length prompts in generate_scan, or batch_size == 1). The
    # per-step K/V row + scale-plane appends then collapse from B unrolled
    # dynamic_update_slices per array to ONE spanning the batch — at
    # 1.5B B=16 INT8-KV the unrolled appends are 3072 serial dus/step,
    # 15.4% of the step (hlo_stats, round 4). Purely a write-path
    # optimization: attention still receives the per-lane position vector.
    # MUST only be set when lane positions are provably equal.
    uniform_pos: bool = False
    # w8a8: dynamically quantize activations to INT8 per row so matmuls
    # against per-channel INT8 weights run as s8×s8 MXU ops — 2× the
    # float-operand weight-load rate, the true GEMV floor (quant/kernels).
    # Weight layout is unchanged (per-channel INT8); this is a runtime
    # choice. CLI: --quant w8a8.
    act_quant: bool = False
    # RING KV cache (the serving append fix, round 5): cache ROW is
    # decoupled from token POSITION. A single device-resident write
    # pointer (cache["wptr"], scalar) advances one row per decode step
    # and EVERY lane writes there — one batch-spanning dus per array
    # regardless of per-slot positions (uniform_pos generalized to
    # position-divergent continuous batching; the B-unrolled appends were
    # 15.4% of the 1.5B B=16 step). Lane validity becomes the ring
    # interval [cache["start"][b], +length[b]) mod S — softmax over a row
    # SET is permutation-invariant, so attention only needs the interval
    # mask (ops.layers._decode_valid_mask; kernels take the extra start
    # prefetch). Admissions roll each lane's linear rows into ring
    # position on splice (runtime/batcher.py). Affects decode_step only;
    # prefill/extend build LINEAR lane caches that admissions rotate.
    ring_cache: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embed // self.n_heads

    @property
    def attn_heads(self) -> int:
        """Head count actually materialized in weights/cache (>= n_heads)."""
        return self.padded_heads or self.n_heads

    @property
    def vocab_rows(self) -> int:
        """Vocab rows actually materialized in wte (>= vocab_size)."""
        return self.padded_vocab_size or self.vocab_size

    @property
    def n_params(self) -> int:
        """Approximate parameter count (with weight tying, like the reference:
        lm_head reuses wte — main.zig:312)."""
        wte = self.vocab_size * self.n_embed
        wpe = self.context_size * self.n_embed
        per_block = (
            # ln_1, ln_2 (weight + bias)
            4 * self.n_embed
            # c_attn: n_embed -> 3*n_embed
            + self.n_embed * 3 * self.n_embed + 3 * self.n_embed
            # c_proj: n_embed -> n_embed
            + self.n_embed * self.n_embed + self.n_embed
            # mlp c_fc: n_embed -> 4*n_embed
            + self.n_embed * 4 * self.n_embed + 4 * self.n_embed
            # mlp c_proj: 4*n_embed -> n_embed
            + 4 * self.n_embed * self.n_embed + self.n_embed
        )
        ln_f = 2 * self.n_embed
        return wte + wpe + self.n_layers * per_block + ln_f


# The GPT-2 model family (BASELINE.json configs require all four sizes).
GPT2_124M = GPTConfig(50257, 1024, 12, 12, 768)
GPT2_355M = GPTConfig(50257, 1024, 24, 16, 1024)
GPT2_774M = GPTConfig(50257, 1024, 36, 20, 1280)
GPT2_1558M = GPTConfig(50257, 1024, 48, 25, 1600)

# Tiny configs for unit tests / CI (shapes chosen to keep TPU tiling valid:
# head_dim = 64 or 32, n_embed a multiple of 128 where possible).
GPT2_NANO = GPTConfig(vocab_size=512, context_size=128, n_layers=2, n_heads=4, n_embed=128)
GPT2_MICRO = GPTConfig(vocab_size=1024, context_size=256, n_layers=4, n_heads=4, n_embed=256)

CONFIGS = {
    "124M": GPT2_124M,
    "355M": GPT2_355M,
    "774M": GPT2_774M,
    "1558M": GPT2_1558M,
    "1.5B": GPT2_1558M,
    "nano": GPT2_NANO,
    "micro": GPT2_MICRO,
}


def get_config(name: str) -> GPTConfig:
    try:
        return CONFIGS[name]
    except KeyError:
        raise ValueError(f"unknown model config {name!r}; choices: {sorted(CONFIGS)}") from None


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Sampling hyperparameters.

    The reference samples with ``logits /= temp; softmax; weightedIndex``
    (main.zig:198-207) and re-seeds its RNG from the wall clock every token —
    here sampling is keyed ``jax.random`` (reproducible) with temperature,
    optional top-k, and greedy (temperature == 0) decode.
    """

    temperature: float = 0.8
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

"""Step-level shard_map decode: the WHOLE decode+sample step as ONE
manual-SPMD region.

The op-level path (parallel/shard_kernels.py) wraps each hot op in its own
``shard_map``, so every transformer block crosses ~6 computation-boundary
fences per step; hlo_stats put the resulting scheduling bubbles at ~10% of
the mesh-1×1 step (BENCHMARKS.md "shard_map parity": 310 µs kernel self-time
vs ~1.2 ms wall). This module erases them: one ``shard_map`` spans the whole
n-token decode chunk — embedding, the layer scan, lm_head, and the sampler —
and every device runs the complete per-shard program with collectives placed
BY HAND exactly where Megatron TP needs them:

- masked-lookup psum at the vocab-sharded token embedding
  (models.gpt2._embed_tokens);
- one psum after each row-parallel projection (attn/mlp c_proj,
  models.gpt2._row_linear_manual) — the column-parallel outputs feed the
  row-parallel inputs directly, so those stay communication-free;
- cross-shard argmax of per-shard Gumbel winners in the sampler
  (runtime.sampling.sample_manual).

Inside the body the model code runs the SINGLE-DEVICE paths (local config:
``spmd=False, mesh=None``) on per-shard shapes — the fused Pallas kernels
(quant/kernels.qmm, ops/attention flash-decode, ops/sampling_kernel) dispatch
exactly as on one chip, over H/tp heads and N/tp (or K/tp) matmul columns.
``config.manual_axis`` is what tells the three collective sites above that
the shapes are shards. This single-region program shape is also what real
multi-chip overlap wants: XLA can schedule the psums against the next
layer's weight streams instead of fencing at region boundaries (SURVEY §2.4).

Dispatch: the engine uses this path when ``enabled(config)`` — on by
default on TPU under a mesh; ZG2_STEP_SPMD=0 falls back to op-level
shard_map kernels, ZG2_STEP_SPMD=1 forces it on (CPU mesh parity tests run
the manual body with the jnp op fallbacks — the collectives are identical).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    cache_pspecs,
    param_pspecs,
)


def enabled(config: GPTConfig) -> bool:
    """Whether decode should run the step-level manual-SPMD path."""
    if not (config.spmd and config.mesh is not None):
        return False
    opt = os.environ.get("ZG2_STEP_SPMD", "auto")
    if opt == "0":
        return False
    if opt == "1":
        return True
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("ZG2_SPMD_KERNELS", "auto") != "0"
        and os.environ.get("ZG2_FUSED_ATTN", "1") != "0"
    )


def local_config(config: GPTConfig) -> GPTConfig:
    """The per-shard config seen INSIDE the shard_map body: single-device
    dispatch (spmd=False, mesh=None) over per-shard shapes, with
    ``manual_axis`` marking where collectives must be inserted by hand.
    Only the head count scales with tp — activations stay full-width
    (replicated between blocks), and the vocab split is implicit in the
    wte/lm_head shard shapes."""
    tp = config.mesh.shape[MODEL_AXIS]
    if config.attn_heads % tp:
        raise ValueError(
            f"attn_heads {config.attn_heads} not divisible by tp {tp} — "
            "run parallel.mesh.prepare_params (pad_for_tp) first"
        )
    # kv_packed carries through: the per-shard body runs the packed fused
    # kernels over this shard's (L, B/dp, Hl/2, S, 2D) cache slice (pairs
    # never straddle shards — default_kv_packed requires Hl even).
    return dataclasses.replace(
        config,
        spmd=False,
        mesh=None,
        manual_axis=MODEL_AXIS,
        padded_heads=config.attn_heads // tp,
        seq_parallel=False,
    )


def step_param_pspecs(config: GPTConfig, params: Dict[str, Any]):
    """Param in_specs for the step shard_map — param_pspecs (the Megatron
    placement) with ONE fix-up: grouped scales of INT4 row-parallel layers
    ride REPLICATED. The half-split nibble packing makes a contiguous
    K-shard of the scale-group axis cover the wrong feature ranges (see
    shard_kernels.int4_row_shard_slices); the body slices the two correct
    group ranges out of the full array by axis_index instead."""
    pp = param_pspecs(config, params)
    for mod in ("attn", "mlp"):
        node = params["blocks"][mod]["c_proj"]
        if "qw4" in node and node["scale"].shape[-2] != 1:
            pp["blocks"][mod]["c_proj"]["scale"] = P(None, None, None)
    return pp


def place_params(params: Dict[str, Any], config: GPTConfig) -> Dict[str, Any]:
    """Re-place any leaves whose step-level in_spec differs from the
    op-level Megatron placement (currently: INT4 row-parallel grouped
    scales, replicated here). Leaves already matching are no-op
    device_puts. Call once at engine init — otherwise the shard_map
    entry all-gathers those scales EVERY step (tens of MB at 1.5B)."""
    pp = step_param_pspecs(config, params)
    shardings = jax.tree.map(
        lambda s: NamedSharding(config.mesh, s),
        pp,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)


def make_chunk_fn(
    config: GPTConfig,
    params: Dict[str, Any],
    kv_quant: Optional[str],
    n: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    emit_consumed: bool = False,
):
    """Build the UNJITTED n-step decode+sample chunk under one shard_map:
    ``(params, cache, token, key) -> (cache, toks (n, B), token, key)``.
    The caller jits it (with the cache donated and its Format/sharding
    pinned via out_shardings), exactly like the fused single-device
    runner — see runtime.engine.InferenceEngine._make_chunk.

    ``emit_consumed``: trace the token CONSUMED at each sub-step instead of
    the one sampled (the ContinuousBatcher convention — its feed vector
    lives on device, so the first consumed token is only known on device)."""
    from zig_gpt2_tpu.models import gpt2
    from zig_gpt2_tpu.runtime.sampling import sample_manual

    mesh = config.mesh
    lconf = local_config(config)
    pp = step_param_pspecs(config, params)
    cp = cache_pspecs(config, quant=kv_quant, data_sharded=True)
    tok_spec = P(DATA_AXIS)
    tp = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]

    def body(params, cache, token, key):
        def step1(carry, _):
            cache, token, key = carry
            cache, logits = gpt2.decode_step(params, cache, token, lconf)
            key, sub = jax.random.split(key)
            nxt = sample_manual(
                logits, sub, temperature, top_k, top_p, MODEL_AXIS,
                tp=tp, data_axis=DATA_AXIS, dp=dp,
            )
            return (cache, nxt, key), (token if emit_consumed else nxt)

        (cache, token, key), toks = jax.lax.scan(
            step1, (cache, token, key), None, length=n
        )
        return cache, toks, token, key

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(pp, cp, tok_spec, P()),
        out_specs=(cp, P(None, DATA_AXIS), tok_spec, P()),
        check_vma=False,
    )

"""Device mesh and sharding construction.

The reference is strictly single-threaded/single-device (SURVEY.md §2.3-2.4:
no parallelism, no communication backend anywhere). The TPU framework scales
via GSPMD: a named 2-D mesh ``("data", "model")``, NamedSharding annotations
on parameters / KV cache / token streams, and ``jax.jit`` letting XLA insert
ICI collectives (psum after the row-parallel projections, all-gathers around
the embedding) — the SURVEY §2.4 design.

Sharding layout (Megatron-style tensor parallelism):

- attention: wq/wk/wv column-parallel on the head axis, c_proj row-parallel;
  the KV cache is head-sharded (Ulysses-style decode — each chip holds
  H/tp heads' cache; no communication during attention itself).
- MLP: c_fc column-parallel, c_proj row-parallel → one psum per pair.
- wte: vocab-sharded (column-parallel tied lm_head); wpe/LayerNorms replicated.
- batch ("data" axis): DP for batched/continuous-batching serving.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zig_gpt2_tpu.config import GPTConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int = 1, tp: Optional[int] = None, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the model axis."""
    devices = devices if devices is not None else jax.devices()
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(f"mesh {dp}x{tp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def _linear_specs(p: Optional[Dict[str, Any]], role: str) -> Dict[str, Any]:
    """Specs for one (possibly quantized) linear param dict.

    role "col": shard the output (last) axis — payload, scales, and bias.
    role "row": shard the contraction (second-to-last) axis — payload and
    the (…, K/G, N) group scales shard identically (group boundaries stay
    intact: K/tp is a multiple of the group size for every GPT-2 dim and
    every tp that divides it); bias replicated.
    """
    col = role == "col"
    w_spec = P(None, None, MODEL_AXIS) if col else P(None, MODEL_AXIS, None)
    b_spec = P(None, MODEL_AXIS) if col else P(None, None)
    if p is None:  # float layout, no params tree supplied
        return {"w": w_spec, "b": b_spec}
    out = {}
    for name in p:
        if name == "scale" and not col and p[name].shape[-2] == 1:
            # Per-channel scales under a row-parallel layer: the single
            # scale row spans ALL of K — replicate it (it multiplies the
            # output columns after the psum; sharding the size-1 group
            # axis is impossible anyway).
            out[name] = P(None, None, None)
        elif name in ("w", "qw", "qw4", "scale"):
            out[name] = w_spec
        elif name == "b":
            out[name] = b_spec
        else:
            raise ValueError(f"unknown linear param leaf {name!r}")
    return out


def param_pspecs(
    config: GPTConfig, params: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """PartitionSpec pytree matching models.gpt2 params (leading L axis on
    block leaves). Pass the actual ``params`` to get specs matching its
    exact structure — required for quantized layouts ({"qw"/"qw4",
    "scale", "b"?}) and the untied quantized lm_head."""
    def lin(role, *path):
        node = params
        if node is not None:
            node = node["blocks"]
            for k in path:
                node = node[k]
        return _linear_specs(node, role)

    ln = {"w": P(None, None), "b": P(None, None)}
    specs = {
        "wte": P(MODEL_AXIS, None),  # vocab-sharded; lm_head column-parallel
        "wpe": P(None, None),
        "blocks": {
            "ln_1": ln,
            "attn": {
                "wq": lin("col", "attn", "wq"),
                "wk": lin("col", "attn", "wk"),
                "wv": lin("col", "attn", "wv"),
                "c_proj": lin("row", "attn", "c_proj"),
            },
            "ln_2": ln,
            "mlp": {
                "c_fc": lin("col", "mlp", "c_fc"),
                "c_proj": lin("row", "mlp", "c_proj"),
            },
        },
        "ln_f": {"w": P(None), "b": P(None)},
    }
    if params is not None and "lm_head" in params:
        # Untied (quantized) lm_head (E, V): vocab(column)-parallel, 2-D.
        specs["lm_head"] = {
            name: P(None, MODEL_AXIS) for name in params["lm_head"]
        }
    return specs


def cache_pspecs(
    config: GPTConfig, quant: Optional[str] = None, data_sharded: bool = True,
    ring: Optional[bool] = None,
) -> Dict[str, Any]:
    """KV cache (L, B, H, S, D): batch on data, heads on model. With
    quant="int8" the per-(token, head) scale planes (L, B, H, S) shard the
    same way. ``data_sharded=False`` replicates the batch axis — used for
    the batcher's single-slot admission caches (B=1 cannot shard dp>1).

    Head-pair-PACKED caches (config.kv_packed, (L, B, H/2, S, 2D)) shard
    the pair axis on model — each shard owns whole local pairs, which is
    why the packed layout under a mesh requires an EVEN per-shard head
    count (models.gpt2.default_kv_packed gates on it). The packed INT8
    scale planes are per-PAIR (L, B, H/2, S) — same axis order as the
    unpacked per-head planes, so one spec covers both layouts."""
    data = DATA_AXIS if data_sharded else None
    kv = P(None, data, MODEL_AXIS, None, None)
    specs = {"k": kv, "v": kv, "length": P(data)}
    if quant == "int8":
        scale = P(None, data, MODEL_AXIS, None)
        specs["k_scale"] = scale
        specs["v_scale"] = scale
    if config.ring_cache if ring is None else ring:
        # Ring leaves: per-lane starts ride the batch split; the write
        # pointer is one global scalar, replicated. ``ring=False``
        # overrides for LINEAR caches built under a ring config (the
        # batcher's admission slot caches / prefix snapshots — they gain
        # ring leaves only when spliced into the shared cache).
        specs["start"] = P(data)
        specs["wptr"] = P()
    return specs


def _named(mesh: Mesh, pspecs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )


def param_shardings(mesh: Mesh, config: GPTConfig, params=None) -> Dict[str, Any]:
    return _named(mesh, param_pspecs(config, params))


def cache_shardings(
    mesh: Mesh, config: GPTConfig, quant: Optional[str] = None,
    data_sharded: bool = True, ring: Optional[bool] = None,
) -> Dict[str, Any]:
    return _named(mesh, cache_pspecs(config, quant, data_sharded, ring=ring))


def shard_params(params, mesh: Mesh, config: GPTConfig):
    """Place a (host or single-device) param pytree onto the mesh."""
    return jax.device_put(params, param_shardings(mesh, config, params))


def prepare_serving(params, config: GPTConfig, mesh: Optional[Mesh],
                    batch_size: int, step_spmd_ok: bool = True,
                    kv_quant=None):
    """Shared InferenceEngine/ContinuousBatcher constructor policy (one
    place so engine and batcher can never drift): land the mesh in the
    config — padding/placing the params if the caller hasn't (pad_for_tp
    sets spmd but not mesh; without the mesh every mesh-aware kernel
    dispatch silently disengages) — validate the data-parallel batch
    split, re-place the step-level-path leaves, and decide the packed
    KV-cache layout. Returns ``(params, config)``.

    ``step_spmd_ok=False``: the caller will not run the step-level decode
    path (e.g. the batcher's speculative serve mode, which is GSPMD
    extend-based) — keep the op-level Megatron placement for every leaf."""
    import dataclasses

    from zig_gpt2_tpu.models import gpt2 as _gpt2
    from zig_gpt2_tpu.parallel import step_spmd

    if mesh is not None:
        if not config.spmd:
            params, config = prepare_params(params, config, mesh)
        elif config.mesh is None:
            config = dataclasses.replace(config, mesh=mesh)
        dp = mesh.shape[DATA_AXIS]
        if batch_size % dp:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data-parallel "
                f"degree {dp} (mesh {dict(mesh.shape)})"
            )
        if step_spmd_ok and step_spmd.enabled(config):
            # Step-level decode wants a couple of leaves placed differently
            # from the op-level Megatron layout (INT4 row-parallel scales);
            # no-op otherwise.
            params = step_spmd.place_params(params, config)
    if not config.kv_packed and _gpt2.default_kv_packed(config, kv_quant):
        # Head-pair-packed cache layout when the fused kernels are active
        # and the cache dtype wants it (the D=64 half-lane fix — see
        # models.gpt2.default_kv_packed for the measured dtype split).
        # Must be decided here, before any cache template / jit
        # construction.
        config = dataclasses.replace(config, kv_packed=True)
    if mesh is None and _gpt2._fuse_qkv_enabled():
        # Single-device only: one (E, 3A) QKV weight stream per layer
        # instead of three dispatches (the reference's packed c_attn,
        # ops.zig:143). Under TP the Q/K/V shard boundaries don't align.
        params = _gpt2.fuse_qkv_params(params)
    return params, config


def prepare_params(params, config: GPTConfig, mesh: Mesh):
    """Make a param pytree servable on ``mesh``: pad head/vocab axes for the
    TP degree (setting ``config.spmd``) and place every leaf with its
    Megatron-style sharding. Returns ``(sharded_params, padded_config)``.

    Works on float params, and on quantized params whose dims already
    divide the mesh; a quantized checkpoint that NEEDS padding cannot be
    padded post-hoc (the packed int4 half-split and scale-group layouts
    don't survive row insertion) — quantize after padding instead
    (quant.quantize_params(tp=...)), as cli.py does.
    """
    import dataclasses

    from zig_gpt2_tpu.parallel import sharding as psh

    tp = mesh.shape[MODEL_AXIS]
    try:
        params, config = psh.pad_for_tp(params, config, tp)
    except KeyError as e:
        raise ValueError(
            "cannot pad a quantized checkpoint for this mesh — requantize "
            "from float weights after padding (cli.py order: load → "
            "pad_for_tp → quantize_params(tp=tp))"
        ) from e
    # Carry the mesh in the config: kernel dispatch sites inside the scan
    # bodies use it to shard_map the Pallas kernels (parallel/shard_kernels).
    # spmd must be true for ANY multi-device mesh, not just tp > 1: a
    # dp-only mesh (e.g. 8x1) still shards the cache/logits batch axis, and
    # the single-device Pallas dispatch paths would hand GSPMD an
    # unpartitionable custom call over those sharded operands.
    n_devices = int(np.prod(list(mesh.shape.values())))
    config = dataclasses.replace(
        config, mesh=mesh, spmd=config.spmd or n_devices > 1
    )
    return jax.device_put(params, param_shardings(mesh, config, params)), config

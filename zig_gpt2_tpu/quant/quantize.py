"""Weight-only INT8 / INT4 quantization with grouped scales.

Scheme (standard weight-only PTQ, designed around the MXU):

- Symmetric absmax quantization along the **contraction (K) axis** in groups
  of ``group_size`` rows: ``qw[k, n] = round(w[k, n] / scale[k // G, n])``
  clipped to [-127, 127] (INT8) or [-7, 7] (INT4).
- Grouping along K (not N) means the matmul can be computed as per-group
  integer-operand dots with the float32 scale applied to the *partial sums*:
  ``y = Σ_g scale[g] · (x[:, g·G:(g+1)·G] @ qw[g·G:(g+1)·G, :])`` — exactly
  equal to dequantize-then-matmul, with no bf16 rounding of the scales and no
  materialized dequantized weight in HBM.
- INT4 values are packed two-per-int8 along K with a **half-split layout**:
  ``packed[k, n]`` holds original row ``k`` in the low nibble and row
  ``k + K/2`` in the high nibble, so unpacking is two arithmetic shifts and a
  concatenate — no lane-axis interleave (which the TPU vector unit hates).

The reference has no quantization (FP32 end to end); its closest analogue is
the offline weight repack in download_weights.py:48-65, which this module
extends (SURVEY.md §5 checkpoint: "quantized weight repacking (INT8/INT4 +
scales) as an offline step").

Layout of a quantized linear param dict (replaces ``{"w", "b"}``):

- INT8: ``{"qw":  int8 (..., K,   N), "scale": f32 (..., K/G, N), "b"?}``
- INT4: ``{"qw4": int8 (..., K/2, N), "scale": f32 (..., K/G, N), "b"?}``

Leading ``...`` dims (the per-layer stack axis) pass through untouched so the
block stack stays a single ``lax.scan``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

# Candidate group sizes, best first. 64 fits every GPT-2 dim; INT4's
# half-split packing additionally needs K/2 % G == 0, which for the 1.5B
# model's K=1600 projections drops the group to 32 (finer groups are strictly
# more accurate, so this only helps PPL). 16/8 exist for tiny test configs.
_GROUP_CANDIDATES = (128, 64, 32, 16, 8)


def pick_group_size(k: int, mode: str, tp: int = 1) -> int:
    """Largest group size compatible with K (and K/2 for the int4 half-split
    packing). ``tp``: when the layer will be row-parallel over a model axis
    of that degree, groups must also divide the per-shard K so scale-group
    boundaries align with shard boundaries."""
    need = [k, k // tp]
    if mode == "int4":
        need += [k // 2, k // (2 * tp)]
    for g in _GROUP_CANDIDATES:
        if all(n % g == 0 for n in need):
            return g
    raise ValueError(f"no valid group size for K={k} ({mode}, tp={tp})")


def is_quantized(p: Dict[str, Any]) -> bool:
    return "qw" in p or "qw4" in p


def quantize_linear(
    p: Dict[str, Any], mode: str = "int8", group_size: Optional[int] = None,
    tp: int = 1,
) -> Dict[str, Any]:
    """Quantize one linear layer's ``{"w", "b"?}`` dict. ``w`` is
    (..., K, N); K is the contraction axis (ops/layers.py convention).

    INT8 defaults to PER-CHANNEL scales (group_size = K, scale (1, N)):
    the fused kernel is VPU-elementwise-bound, and a per-column scale lets
    it skip the per-element dequant multiply entirely (one int8→bf16
    convert + an O(B·N) post-scale — measured ~2x the grouped kernel;
    per-channel INT8 weight-only is the standard near-lossless scheme).
    INT4 keeps grouped scales (group_size=K would cost real PPL at 4
    bits). Pass ``group_size`` explicitly for the old grouped-INT8 layout.
    Per-channel scales are TP-agnostic (replicated; applied after the
    row-parallel psum), so ``tp`` only constrains grouped modes."""
    w = jnp.asarray(p["w"])
    k = w.shape[-2]
    if group_size is None and mode == "int8":
        g = k  # per-channel
    else:
        g = group_size or pick_group_size(k, mode, tp)
    if k % g:
        raise ValueError(f"K={k} not divisible by group_size={g}")
    qmax = 7.0 if mode == "int4" else 127.0

    wf = w.astype(jnp.float32)
    grouped = wf.reshape(*w.shape[:-2], k // g, g, w.shape[-1])
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    # Zero-padded columns (TP head padding) have absmax 0 — keep scale finite.
    scale = jnp.maximum(absmax, 1e-12) / qmax
    q = jnp.clip(jnp.round(grouped / scale), -qmax, qmax).astype(jnp.int8)
    q = q.reshape(w.shape)
    scale = scale.squeeze(-2)  # (..., K/G, N)

    out: Dict[str, Any] = {"scale": scale}
    if mode == "int8":
        out["qw"] = q
    elif mode == "int4":
        lo, hi = jnp.split(q, 2, axis=-2)  # rows [0, K/2), [K/2, K)
        out["qw4"] = ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)
    else:
        raise ValueError(f"unknown quantization mode {mode!r}")
    if p.get("b") is not None:
        out["b"] = p["b"]
    return out


def unpack_int4(qw4: jax.Array) -> jax.Array:
    """(…, K/2, N) packed int4 -> (…, K, N) int8 in [-7, 7].

    Low nibble = rows [0, K/2), high nibble = rows [K/2, K). Sign extension
    of the low nibble is (x << 4) >> 4 on int8 (arithmetic shift)."""
    lo = (qw4 << 4) >> 4
    hi = qw4 >> 4
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_linear(p: Dict[str, Any], dtype=jnp.float32) -> Dict[str, Any]:
    """Reconstruct a float ``{"w", "b"?}`` dict (reference path for tests
    and for the PPL-gate comparison)."""
    q = p["qw"] if "qw" in p else unpack_int4(p["qw4"])
    k, n = q.shape[-2], q.shape[-1]
    groups = p["scale"].shape[-2]
    grouped = q.astype(jnp.float32).reshape(*q.shape[:-2], groups, k // groups, n)
    w = (grouped * p["scale"][..., :, None, :]).reshape(*q.shape[:-2], k, n)
    out = {"w": w.astype(dtype)}
    if "b" in p:
        out["b"] = p["b"]
    return out


# ---------------------------------------------------------------------------
# Matmul paths
# ---------------------------------------------------------------------------

def _grouped_matmul_jnp(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """Exact grouped quantized matmul in plain jnp (CPU / fallback path).

    x: (B, K) — q: (K, N) int8 — scale: (K/G, N) f32. The per-group partial
    dots keep the int8 operand until the MXU multiply and apply f32 scales to
    the f32 partials — numerically identical to the Pallas kernel.
    """
    b, k = x.shape
    groups, n = scale.shape
    g = k // groups
    xg = x.reshape(b, groups, g).swapaxes(0, 1)  # (groups, B, G)
    qg = q.astype(x.dtype).reshape(groups, g, n)
    partial = jax.lax.dot_general(
        xg, qg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (groups, B, N)
    return jnp.sum(partial * scale[:, None, :].astype(jnp.float32), axis=0)


def quantize_rows(x: jax.Array) -> tuple:
    """Dynamic per-row symmetric INT8 activation quantization:
    (..., K) float -> ((..., K) int8, (...,) f32 row scales). The w8a8
    path's activation side — O(B·K), trivial next to the weight stream."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    sx = jnp.maximum(absmax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx[..., None]), -127, 127).astype(jnp.int8)
    return xq, sx


def w8a8_matmul(x: jax.Array, qw: jax.Array, scale: jax.Array) -> jax.Array:
    """y = x @ dequant(qw) with BOTH operands int8 on the MXU.

    Requires per-channel scales (scale (1, N)). The MXU streams weight
    elements at a fixed element rate (~480 Gelem/s measured on v5e —
    the true GEMV floor, dtype-invariant for float operands); int8×int8
    ops run at 2× that rate, which is the only way a quantized GEMV
    beats the bf16 one on weight-load throughput. Activations are
    dynamically quantized per row (quantize_rows); the int32 accumulator
    is exact, so the only new error is the activation rounding.
    """
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, qw,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx[:, None] * scale[0][None, :]


def _under_spmd() -> bool:
    """True when tracing under a non-trivial mesh — GSPMD can't partition
    the Pallas custom call, so the sharded path uses the jnp formulation
    (per-shard Pallas via shard_map is the manual alternative). A FULLY-
    MANUAL mesh (inside a shard_map body, e.g. the step-level decode of
    parallel/step_spmd) does NOT count: the body already sees per-shard
    shapes and the custom call runs per device."""
    try:
        from jax.sharding import AxisType, get_abstract_mesh

        m = get_abstract_mesh()
        if not m.axis_names:
            return False
        return not all(t == AxisType.Manual for t in m.axis_types)
    except Exception:
        return False


def quantized_linear(
    p: Dict[str, Any], x: jax.Array, spmd: bool = False,
    act_quant: bool = False,
) -> jax.Array:
    """y = x @ dequant(qw) (+ b), without materializing the dequantized
    weight. Dispatches to the fused Pallas kernel on TPU (the analogue of the
    reference's cblas_sgemm Linear hot path, ops.zig:30-45, at 1/4–1/8 the
    HBM traffic); jnp grouped matmul elsewhere. Pass spmd=True when tracing
    under GSPMD sharding (the custom call cannot be partitioned).

    ``act_quant``: the w8a8 path — dynamic per-row INT8 activations into
    s8×s8 MXU ops (2× the float-operand weight-load rate). Applies only to
    per-channel INT8 layers (scale (…, 1, N)); others fall through."""
    q = p.get("qw")
    int4 = q is None
    if int4:
        q = p["qw4"]
    *lead, k_in = x.shape
    x2 = x.reshape(-1, k_in)
    n = q.shape[-1]
    rows = x2.shape[0]
    w8a8 = act_quant and not int4 and p["scale"].shape[-2] == 1

    from zig_gpt2_tpu.quant import kernels

    cap = kernels.W8A8_MAX_ROWS if w8a8 else kernels.GEMV_MAX_ROWS
    if (
        jax.default_backend() == "tpu" and rows <= cap and not spmd
        and not _under_spmd()
        and os.environ.get("ZG2_QMM", "1") != "0"  # triage escape hatch
    ):
        # Decode / small-batch GEMV: memory-bound on the weight read — the
        # fused kernel streams int8/int4 straight from HBM.
        y = kernels.qmm(x2, q, p["scale"], int4=int4, w8a8=w8a8)
    elif w8a8:
        y = w8a8_matmul(x2, q, p["scale"])
    elif rows <= kernels.GEMV_MAX_ROWS:
        qfull = unpack_int4(q) if int4 else q
        y = _grouped_matmul_jnp(x2, qfull, p["scale"])
    else:
        # Prefill / eval: compute-bound — dequantize to the activation dtype
        # and take the plain MXU GEMM.
        w = dequantize_linear(p, dtype=x.dtype)["w"]
        y = jnp.dot(x2, w, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(*lead, n)
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Whole-model quantization
# ---------------------------------------------------------------------------

_BLOCK_LINEARS = (
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "c_proj"),
    ("mlp", "c_fc"), ("mlp", "c_proj"),
)


def quantize_params(
    params: Dict[str, Any],
    mode: str = "int8",
    group_size: Optional[int] = None,
    quantize_lm_head: bool = True,
    tp: int = 1,
) -> Dict[str, Any]:
    """Quantize every block linear (and the lm_head) of a gpt2 param pytree.

    Embeddings (wte/wpe) and LayerNorms stay in float — they are gathers and
    normalizations, not MXU work. The tied lm_head (main.zig:312) is untied
    into an explicit quantized ``params["lm_head"]`` (wte itself must stay
    float for the embedding gather); at INT4 the lm_head is kept INT8 — it is
    the largest, final, most outlier-sensitive GEMM, and the extra 25 MB on a
    1.5B model buys a disproportionate chunk of the PPL budget.
    """
    params = dict(params)
    blocks = dict(params["blocks"])
    for mod, name in _BLOCK_LINEARS:
        sub = dict(blocks[mod])
        # Row-parallel layers (c_proj) shard the contraction axis under TP:
        # their scale groups must divide the per-shard K (parallel/mesh.py).
        layer_tp = tp if name == "c_proj" else 1
        sub[name] = quantize_linear(sub[name], mode, group_size, tp=layer_tp)
        blocks[mod] = sub
    params["blocks"] = blocks
    if quantize_lm_head and "lm_head" not in params:
        lm_mode = "int8" if mode == "int4" else mode
        params["lm_head"] = quantize_linear(
            {"w": params["wte"].T, "b": None}, lm_mode, group_size
        )
    return params

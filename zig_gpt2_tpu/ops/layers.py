"""Pure-jnp reference ops — the numeric contract of the framework.

Each op mirrors the *semantics* of the reference's ops.zig (cited per-op) in
idiomatic, batched, jit-friendly JAX. These are the baselines the Pallas
kernels in ``zig_gpt2_tpu.ops.pallas`` are parity-tested against, and the
fallback path on non-TPU backends.

Conventions (deliberately different from the reference where the reference's
choice was a CPU artifact):

- Linear weights are stored ``(in_features, out_features)`` so the forward is
  a plain ``x @ W + b`` that XLA maps straight onto the MXU. The reference
  pre-transposes weights to column-major for cblas_sgemm (ops.zig:9,
  download_weights.py:59-61); the raw-file importer un-does that transpose.
- All ops are batched over arbitrary leading dims (the reference is batch=1,
  a documented restriction at ops.zig:126-128).
- Softmax/LayerNorm statistics are computed in float32 regardless of the
  activation dtype (bf16-safe).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# sqrt(2/pi) to the same precision the reference hardcodes (ops.zig:224).
_GELU_C = 0.7978845608028654


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ W (+ b).

    Reference: ops.zig:4-47 (Linear.forward; sgemm NoTrans×Trans against
    pre-transposed weights, bias broadcast then beta=1 accumulate). Here the
    weight is (in, out) and the bias is a fused broadcast add. Bias is
    optional because the tied lm_head has none (main.zig:312).
    """
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def embedding(idxs: jax.Array, weight: jax.Array) -> jax.Array:
    """Row gather: out[i] = weight[idxs[i]]. Reference: ops.zig:49-68."""
    return jnp.take(weight, idxs, axis=0)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """LayerNorm over the last axis with affine transform.

    Reference: ops.zig:70-105 — single-pass E[x²]−mean² variance, eps=1e-5
    *inside* the sqrt: ``std = sqrt(E[x²] − mean² + eps)``. We keep the
    biased-variance + eps-in-sqrt formulation (it matches torch
    F.layer_norm numerics) but compute stats in float32.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    out = (xf - mean) * inv * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Tanh-approximation GELU.

    Reference: ops.zig:221-228 — ``0.5·x·(1+tanh(x·sqrt(2/π)·(1+0.044715·x²)))``,
    algebraically identical to PyTorch's ``tanh(sqrt(2/π)·(x+0.044715·x³))``
    form (SURVEY.md C7). Computed here in the equivalent sigmoid form
    ``x·σ(2u)`` (tanh(u) = 2σ(2u)−1): it avoids the (1+tanh) catastrophic
    cancellation in the saturated tail, where XLA's tanh and libm's disagree —
    measured max |Δ| vs torch over [-10,10]: 5.5e-5 tanh-form vs 4.8e-7
    sigmoid-form — and is one transcendental instead of two on the VPU.
    """
    xf = x.astype(jnp.float32)
    u = _GELU_C * xf * (1.0 + 0.044715 * xf * xf)
    out = xf * jax.nn.sigmoid(2.0 * u)
    return out.astype(x.dtype)


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable softmax (subtract max). Reference: ops.zig:231-241.

    Stats in float32 for bf16 inputs.
    """
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=axis, keepdims=True)
    e = jnp.exp(xf - m)
    out = e / jnp.sum(e, axis=axis, keepdims=True)
    return out.astype(x.dtype)


# Large negative filler for masked attention scores. Not -inf: exp(-inf - -inf)
# would NaN in the all-masked case (same reasoning as JAX's flash kernels).
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    length_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence multi-head causal attention (prefill path).

    Args:
      q, k, v: (batch, n_heads, seq, head_dim).
      length_mask: optional (batch, seq) bool — True for valid positions
        (padded batched prefill).

    Returns (batch, n_heads, seq, head_dim).

    The reference has no full-sequence path (its prefill feeds one token at a
    time, main.zig:331-334); the semantics here are the PyTorch oracle's
    masked SDPA (generate_test_data.py:109-119) batched over heads.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    seq_q, seq_k = scores.shape[-2], scores.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (seq_q, seq_k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (seq_q, seq_k), 1)
    mask = (col <= row + (seq_k - seq_q))  # support seq_q <= seq_k
    if length_mask is not None:
        mask = mask & length_mask[:, None, None, :]
    scores = jnp.where(mask, scores, MASK_VALUE)
    probs = softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (per token, per head) symmetric INT8 quantization of K/V.

    x: (..., D) float -> (int8 (..., D), f32 scale (...,)). Row-granular
    scales make the append step O(1) (no running stats) and dequantization
    free inside attention: the K scale multiplies the score and the V scale
    folds into the probability (see decode_attention_quant).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _decode_valid_mask(max_seq: int, length, start=None) -> jax.Array:
    """(B, 1, S) (or (1, 1, S) for scalar length) validity mask for decode
    attention. ``start=None``: a length PREFIX — rows [0, length). With
    ``start`` (B,) given, the RING-interval mask [start, start+length) mod
    max_seq (runtime ring cache: cache row is decoupled from token
    position; softmax over a row SET is permutation-invariant, so interval
    membership is all attention needs)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (max_seq, 1), 0).squeeze(-1)
    length = jnp.asarray(length)
    if start is None:
        if length.ndim == 0:
            return (pos < length)[None, None, :]
        return (pos[None, :] < length[:, None])[:, None, :]
    start = jnp.asarray(start)
    rel = pos[None, :] - start[:, None]  # (B, S)
    rel = rel + jnp.where(rel < 0, max_seq, 0)
    return (rel < length[:, None])[:, None, :]


def decode_attention_quant(
    q: jax.Array,
    k_cache: jax.Array,
    k_scale: jax.Array,
    v_cache: jax.Array,
    v_scale: jax.Array,
    length: jax.Array,
    start: Optional[jax.Array] = None,
) -> jax.Array:
    """decode_attention over an INT8 KV cache — dequantization is folded
    into the attention math, never materialized:

      score[s] = (q · k_int8[s]) · k_scale[s] / sqrt(D)
      out      = Σ_s (p[s] · v_scale[s]) · v_int8[s]

    Args:
      q: (B, H, D) float.  k_cache/v_cache: (B, H, S, D) int8.
      k_scale/v_scale: (B, H, S) f32 per-row scales.
      length: (B,) or scalar int32 valid rows.
      start: optional (B,) ring-interval start rows (see _decode_valid_mask).
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    kf = k_cache.astype(jnp.bfloat16)  # int8 is exact in bf16
    scores = jnp.einsum(
        "bhd,bhsd->bhs", q.astype(jnp.bfloat16), kf,
        preferred_element_type=jnp.float32,
    ) * (k_scale * scale)
    valid = _decode_valid_mask(k_cache.shape[-2], length, start)
    scores = jnp.where(valid, scores, MASK_VALUE)
    probs = softmax(scores, axis=-1)  # f32
    pv = (probs * v_scale).astype(jnp.bfloat16)
    return jnp.einsum(
        "bhs,bhsd->bhd", pv, v_cache.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    length: jax.Array,
    start: Optional[jax.Array] = None,
) -> jax.Array:
    """Single-token decode attention over a fixed-shape KV cache.

    Args:
      q: (batch, n_heads, head_dim) — the one new query.
      k_cache, v_cache: (batch, n_heads, max_seq, head_dim); rows >= length
        are garbage and masked out.
      length: scalar or (batch,) int32 — number of valid cache rows
        (including the current token, already appended).
      start: optional (B,) ring-interval start rows (see _decode_valid_mask).

    Reference: ops.zig:249-307 (scaled_dot_product_attention with q_len=1 —
    the single query attends to all cached keys, no causal mask needed; the
    fixed-shape + length-mask design replaces the reference's dynamic
    seq_len slices, which jit cannot express).
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum(
        "bhd,bhsd->bhs", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    valid = _decode_valid_mask(k_cache.shape[-2], length, start)
    scores = jnp.where(valid, scores, MASK_VALUE)
    probs = softmax(scores, axis=-1)
    return jnp.einsum(
        "bhs,bhsd->bhd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _extend_mask(base: jax.Array, valid: jax.Array, T: int, S: int) -> jax.Array:
    """(B, T, S) bool attention mask for ``extend_attention``: window row t
    (absolute position base+t) may see cache cols <= base+t, clipped to the
    window's valid rows (cols >= base+valid are padding appends). Padding
    QUERY rows produce garbage outputs — callers discard them (the logits
    gather in speculative decode indexes only valid positions)."""
    col = jnp.arange(S)
    row = jnp.arange(T)
    limit = jnp.minimum(base[:, None] + row[None, :] + 1,
                        (base + valid)[:, None])  # (B, T)
    return col[None, None, :] < limit[:, :, None]


def extend_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    base: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Multi-query decode attention: T new queries over a fixed-shape cache
    whose rows [base, base+T) were JUST appended (append-then-attend — the
    in-window causal structure falls out of the column mask, no separate
    window term). The speculative-decode verify/catch-up path
    (runtime/speculative.py): one weight-streaming pass scores T draft
    tokens instead of T sequential single-row steps.

    Args:
      q: (B, H, T, D) — the window's queries, T small (k+1 draft tokens).
      k_cache, v_cache: (B, H, S, D) with the window rows written.
      base: (B,) int32 cache rows valid BEFORE the window (per lane).
      valid: (B,) int32 valid window rows (1 <= valid <= T); padding rows
        beyond are masked for every query.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    mask = _extend_mask(base, valid, q.shape[-2], k_cache.shape[-2])
    scores = jnp.where(mask[:, None], scores, MASK_VALUE)
    probs = softmax(scores, axis=-1)
    return jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def extend_attention_quant(
    q: jax.Array,
    k_cache: jax.Array,
    k_scale: jax.Array,
    v_cache: jax.Array,
    v_scale: jax.Array,
    base: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """``extend_attention`` over the INT8 KV cache — same folded
    dequantization as decode_attention_quant (K scale multiplies the score,
    V scale folds into the probability).

    q: (B, H, T, D) float; k/v_cache: (B, H, S, D) int8;
    k/v_scale: (B, H, S) f32; base/valid: (B,) int32.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    kf = k_cache.astype(jnp.bfloat16)  # int8 is exact in bf16
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q.astype(jnp.bfloat16), kf,
        preferred_element_type=jnp.float32,
    ) * (k_scale[:, :, None, :] * scale)
    mask = _extend_mask(base, valid, q.shape[-2], k_cache.shape[-2])
    scores = jnp.where(mask[:, None], scores, MASK_VALUE)
    probs = softmax(scores, axis=-1)  # f32
    pv = (probs * v_scale[:, :, None, :]).astype(jnp.bfloat16)
    return jnp.einsum(
        "bhts,bhsd->bhtd", pv, v_cache.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)

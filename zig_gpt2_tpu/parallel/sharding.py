"""TP-divisibility padding.

GPT-2's dims don't always divide a TPU mesh: 1.5B has 25 attention heads and
every size has vocab 50257. ``pad_for_tp`` pads the parameter pytree so the
head and vocab axes divide the model-parallel degree, **without changing the
model's function**:

- Extra attention heads get zero wq/wk/wv columns and zero c_proj rows. Their
  attention output is an arbitrary convex combination of zero value vectors
  == 0, and c_proj's zero rows annihilate it — exact no-op, verified in
  tests/test_sharding.py.
- Extra vocab rows get zero embeddings; their logits are masked to MASK_VALUE
  inside the model (gpt2._lm_head) so sampling cannot pick them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from zig_gpt2_tpu.config import GPTConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_dims(config: GPTConfig, tp: int, vocab_multiple: int = 128) -> Tuple[int, int]:
    """(padded_heads, padded_vocab) for a given TP degree. Vocab is padded to
    a multiple of lcm(tp, vocab_multiple) — the 128-lane alignment also makes
    the lm_head tile cleanly on the MXU."""
    import math

    heads = _round_up(config.n_heads, tp)
    vocab = _round_up(config.vocab_size, math.lcm(tp, vocab_multiple))
    return heads, vocab


def pad_for_tp(
    params: Dict[str, Any], config: GPTConfig, tp: int
) -> Tuple[Dict[str, Any], GPTConfig]:
    """Pad params + config so head/vocab axes divide ``tp``. Idempotent; a
    no-op (returns inputs unchanged) when everything already divides."""
    heads, vocab = padded_dims(config, tp)
    if config.n_embed % tp or (4 * config.n_embed) % tp:
        raise ValueError(f"n_embed {config.n_embed} not divisible by tp={tp}")
    if heads == config.attn_heads and vocab == config.vocab_rows:
        return params, dataclasses.replace(config, spmd=tp > 1 or config.spmd)

    D = config.head_dim
    new_cfg = dataclasses.replace(
        config,
        padded_heads=heads if heads != config.n_heads else config.padded_heads,
        padded_vocab_size=vocab if vocab != config.vocab_size else config.padded_vocab_size,
        spmd=tp > 1 or config.spmd,
    )
    a_old = config.attn_heads * D
    a_new = heads * D

    def pad_last(x, new_size):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, new_size - x.shape[-1])]
        return jnp.pad(x, pad)

    def pad_axis(x, axis, new_size):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, new_size - x.shape[axis])
        return jnp.pad(x, pad)

    params = jax.tree.map(lambda x: x, params)  # shallow structural copy
    attn = params["blocks"]["attn"]
    if a_new != a_old:
        for name in ("wq", "wk", "wv"):
            attn[name] = {
                "w": pad_last(attn[name]["w"], a_new),
                "b": pad_last(attn[name]["b"], a_new),
            }
        attn["c_proj"] = {
            "w": pad_axis(attn["c_proj"]["w"], 1, a_new),
            "b": attn["c_proj"]["b"],
        }
        params["blocks"] = dict(params["blocks"], attn=attn)
    if vocab != config.vocab_rows:
        params["wte"] = pad_axis(params["wte"], 0, vocab)
    return params, new_cfg

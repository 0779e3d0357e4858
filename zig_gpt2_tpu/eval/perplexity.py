"""Token-level perplexity evaluation.

The graded quantization metric (BASELINE.md): WikiText-2 PPL Δ vs FP32 must
be ≤ 0.1 at INT8 and ≤ 0.5 at INT4. The reference has no eval harness at all
(its only runtime output is streamed tokens, main.zig:340); this is new
TPU-first machinery: fixed-shape jitted chunk loss, batched over windows,
log-softmax in float32.

WikiText-2 itself cannot be downloaded in this environment (zero egress);
``load_tokens`` accepts any local text/token file and the test suite uses
synthetic corpora. The harness is dataset-agnostic: PPL over a token stream.
"""

from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.models import gpt2


@functools.partial(jax.jit, static_argnames=("config",))
def _chunk_nll(params, tokens: jax.Array, mask: jax.Array, config: GPTConfig):
    """Summed next-token NLL over a (B, T) chunk batch.

    Returns (total_nll, total_count). mask[b, t] marks positions whose
    *prediction target* tokens[b, t+1] counts toward the loss.
    """
    logits = gpt2.forward(params, tokens, config)  # (B, T, vocab)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    m = mask[:, :-1].astype(jnp.float32)
    return jnp.sum(nll * m), jnp.sum(m)


def perplexity(
    params,
    config: GPTConfig,
    token_ids: np.ndarray,
    window: Optional[int] = None,
    batch_size: int = 8,
) -> float:
    """PPL of a token stream under non-overlapping context windows.

    The stream is split into ``window``-sized chunks (default: the model's
    context); every token with a preceding in-window context token is scored.
    Fixed shapes: the tail chunk is padded and masked, so exactly one jit
    trace serves any corpus length.
    """
    window = window or config.context_size
    ids = np.asarray(token_ids, np.int32)
    if ids.size < 2:
        raise ValueError("need at least 2 tokens to measure perplexity")
    n_chunks = -(-ids.size // window)
    padded = np.zeros((n_chunks, window), np.int32)
    mask = np.zeros((n_chunks, window), np.bool_)
    for i in range(n_chunks):
        part = ids[i * window : (i + 1) * window]
        padded[i, : part.size] = part
        # position t is masked iff target t+1 exists in this chunk
        mask[i, : max(part.size - 1, 0)] = True
    # Pad the chunk count to a multiple of batch_size (masked rows are free).
    pad_rows = (-n_chunks) % batch_size
    if pad_rows:
        padded = np.concatenate([padded, np.zeros((pad_rows, window), np.int32)])
        mask = np.concatenate([mask, np.zeros((pad_rows, window), np.bool_)])

    total_nll, total_cnt = 0.0, 0.0
    for i in range(0, padded.shape[0], batch_size):
        nll, cnt = _chunk_nll(
            params,
            jnp.asarray(padded[i : i + batch_size]),
            jnp.asarray(mask[i : i + batch_size]),
            config,
        )
        total_nll += float(nll)
        total_cnt += float(cnt)
    return math.exp(total_nll / max(total_cnt, 1.0))


def load_tokens(path: str, encoder=None) -> np.ndarray:
    """Load an eval corpus: .npy/.bin of int32 token ids, or raw text
    (requires an encoder). WikiText-2's standard file is
    ``wiki.test.tokens`` — pass it here with the BPE encoder."""
    p = Path(path)
    if p.suffix == ".npy":
        return np.load(p).astype(np.int32)
    if p.suffix == ".bin":
        return np.fromfile(p, dtype=np.int32)
    text = p.read_text(encoding="utf-8")
    if encoder is None:
        raise ValueError("raw-text corpus needs a tokenizer")
    return np.asarray(encoder.encode(text), np.int32)


def ppl_gate(
    params_fp32,
    params_quant,
    config: GPTConfig,
    token_ids: np.ndarray,
    budget: float,
    **kw,
) -> Tuple[bool, float, float]:
    """The BASELINE.json quantization gate: PPL(quant) − PPL(fp32) ≤ budget.

    Returns (passed, ppl_fp32, ppl_quant)."""
    p_fp = perplexity(params_fp32, config, token_ids, **kw)
    p_q = perplexity(params_quant, config, token_ids, **kw)
    return (p_q - p_fp) <= budget, p_fp, p_q

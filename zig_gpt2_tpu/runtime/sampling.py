"""Token sampling.

The reference samples with ``logits /= temp; softmax; rng.weightedIndex`` and
re-seeds from the wall clock every token (main.zig:198-207 — irreproducible by
design). Here sampling is a pure jittable function over a threaded PRNG key:
``jax.random.categorical(key, logits/temp)`` is exactly the reference's
multinomial-over-softmax, reproducible, batched, and fusable into the decode
step. Temperature 0 means greedy argmax; top-k restricts to the k best logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> jax.Array:
    """Draw next tokens from (B, vocab) logits -> (B,) int32.

    temperature and top_k are static (python) values — they select the traced
    graph, which is how a jitted decode loop wants them.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

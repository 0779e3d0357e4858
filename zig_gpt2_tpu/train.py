"""Training: causal-LM loss and a sharded train step.

The reference is inference-only. The framework adds a minimal but complete
training path (next-token cross-entropy + optax optimizer) because the same
sharded forward pass serves both; the multi-chip dry-run entry point jits
this full step over a (data, model) mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from zig_gpt2_tpu.config import GPTConfig
from zig_gpt2_tpu.models import gpt2


def loss_fn(
    params, tokens: jax.Array, config: GPTConfig,
    mask: Optional[jax.Array] = None, remat: bool = False,
) -> jax.Array:
    """Mean next-token cross-entropy over (B, T) token batches.

    ``mask``: optional (B, T-1) validity mask for padded batches.
    ``remat``: checkpoint each transformer block (jax.checkpoint) — trades
    recompute FLOPs for activation HBM (SURVEY-mandated remat support).
    """
    logits = gpt2.forward(params, tokens[:, :-1], config, remat=remat)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(nll)


def make_optimizer(
    learning_rate: float = 3e-4, weight_decay: float = 0.1, b1=0.9, b2=0.95
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)


def train_step(
    params, opt_state, tokens, config: GPTConfig, optimizer, remat: bool = False
) -> Tuple[Any, Any, jax.Array]:
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, config, remat=remat)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_train_step(config: GPTConfig, optimizer, remat: bool = False):
    """Jitted train step with params/opt_state donated. With sharded inputs
    (parallel.mesh.param_shardings + tokens on the data axis) XLA/GSPMD emits
    the TP collectives; gradients reduce over the data axis automatically."""
    fn = functools.partial(
        train_step, config=config, optimizer=optimizer, remat=remat
    )
    return jax.jit(fn, donate_argnums=(0, 1))

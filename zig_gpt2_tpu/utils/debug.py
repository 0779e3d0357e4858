"""Numeric-safety debugging (SURVEY.md §5 "race detection / sanitizers").

The reference's nearest analogue is Zig's Debug/ReleaseSafe bounds checking
(build.zig:16); it is single-threaded so races cannot exist. In JAX the
code is functional and deterministic by construction — the failure modes
worth instrumenting are numeric (NaN/Inf from bad weights or masks) and
out-of-bounds *semantics* (clamped dynamic slices silently writing the
wrong row). Tools here:

- ``nan_checks()``: context manager enabling jax_debug_nans/infs — every
  jitted function re-runs un-jitted on failure and points at the exact
  primitive that produced the first NaN.
- ``checked_decode_step``: a checkify-wrapped decode step asserting the
  cache-length invariants that clamped dynamic slices would otherwise hide
  (the reference aborts on any error via Zig's `!` unions, main.zig:344;
  this is the bounded, recoverable version).
"""

from __future__ import annotations

import contextlib
import functools

import jax
from jax.experimental import checkify

from zig_gpt2_tpu.models import gpt2


@contextlib.contextmanager
def nan_checks(enable: bool = True):
    if not enable:
        yield
        return
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def checked_decode_step(config):
    """decode_step with checkify'd invariants: cache positions must stay in
    [0, max_seq) — a violation means a scheduler bug that clamping would
    silently corrupt. Returns (err, (cache, logits)); call err.throw() to
    surface failures."""

    def step(params, cache, tokens):
        max_seq = cache["k"].shape[-2]
        checkify.check(
            jax.numpy.all(cache["length"] < max_seq),
            "KV cache overflow: length {l} >= max_seq", l=cache["length"],
        )
        checkify.check(
            jax.numpy.all(cache["length"] >= 0),
            "negative cache length {l}", l=cache["length"],
        )
        return gpt2.decode_step(params, cache, tokens, config)

    checked = checkify.checkify(step, errors=checkify.user_checks)
    return jax.jit(checked)

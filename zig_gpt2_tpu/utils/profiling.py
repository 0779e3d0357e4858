"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference — its
only measurement is the README's ~28 ms/token claim)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_timer(block_on=None) -> Iterator[dict]:
    """Wall-clock bracket; pass the output array(s) via ``t["out"] = ...`` (or
    the ``block_on`` arg for pre-existing arrays) and the timer blocks on them
    before reading the clock.

    Usage::
        with device_timer() as t:
            t["out"] = jitted_fn(x)
        print(t["ms"])
    """
    result: dict = {}
    start = time.perf_counter()
    try:
        yield result
    finally:
        target = result.get("out", block_on)
        if target is not None:
            jax.block_until_ready(target)
        result["ms"] = (time.perf_counter() - start) * 1000.0


@contextlib.contextmanager
def xprof_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (Perfetto/XProf) when a directory is given; no-op
    otherwise. Wired to the CLI's --profile flag."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

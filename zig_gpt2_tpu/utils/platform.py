"""Backend selection that survives plugin-preloading environments.

Plain ``JAX_PLATFORMS=cpu`` in the environment does not stick in containers
whose sitecustomize force-registers an accelerator PJRT plugin and re-exports
``JAX_PLATFORMS`` — the knob that always wins is ``jax.config`` set after
import but before first device use. Every user-facing entry point (cli,
tools, bench) funnels through here so ``ZG2_PLATFORM=cpu`` reliably keeps a
process off the chip (only ONE process may own a TPU at a time).
"""

from __future__ import annotations

import os
from typing import Optional


def apply_platform_override(explicit: Optional[str] = None) -> Optional[str]:
    """Force the JAX backend to ``explicit`` or ``$ZG2_PLATFORM`` if given.

    Must run before any jax device use. Returns the platform applied (or
    None if no override was requested).
    """
    platform = explicit or os.environ.get("ZG2_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform

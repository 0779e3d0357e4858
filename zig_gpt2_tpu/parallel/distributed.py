"""Multi-host bootstrap.

The reference is a single process (main.zig:344) — no distributed backend
exists to port. The TPU equivalent (SURVEY.md §2.4): every host in a pod
slice runs the same program; ``jax.distributed.initialize`` wires the
coordinator, after which ICI/DCN collectives are emitted by XLA from the
sharding annotations (parallel/mesh.py) — there is no NCCL/MPI layer to
manage.

Failure-handling policy (SURVEY.md §5, explicit scope): bounded init
(coordinator timeout -> clean abort with a diagnosable error) and fail-stop
on peer loss (XLA collectives abort the step; we re-raise rather than try
elastic recovery — elasticity is a documented non-goal at GPT-2 scale).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    init_timeout_s: int = 300,
) -> None:
    """Bounded multi-host init. With no arguments, TPU pod environments are
    auto-detected (GKE/Cloud TPU metadata); single-process runs return
    immediately. Raises RuntimeError on timeout instead of hanging the job.
    """
    if num_processes in (None, 1) and coordinator_address is None and (
        os.environ.get("TPU_WORKER_HOSTNAMES") in (None, "")
        and os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is None
    ):
        log.info("single-process run; skipping jax.distributed.initialize")
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=init_timeout_s,
        )
    except Exception as e:  # fail-stop with context, never hang
        raise RuntimeError(
            f"multi-host initialization failed (coordinator="
            f"{coordinator_address!r}, processes={num_processes}, "
            f"timeout={init_timeout_s}s): {e}"
        ) from e
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )

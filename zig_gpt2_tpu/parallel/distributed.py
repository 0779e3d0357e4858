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


# XLA flags for collective-compute overlap (SURVEY §2.4). The latency-hiding
# scheduler lets XLA start TP all-gathers/reduce-scatters while independent
# layer compute runs, instead of serializing collective → compute; async
# collective fusion + multiple async copies are its enablers on TPU. These
# must be in XLA_FLAGS BEFORE the backend initializes (first jax API call
# that touches devices), hence a flag-string helper rather than a runtime
# switch. Effect is only measurable on real multi-chip hardware — wired
# here + in cli/bench so the scaling run is one flag when hardware exists.
OVERLAP_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true",
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true",
    "--xla_tpu_overlap_compute_collective_tc=true",
    "--xla_enable_async_all_gather=true",
    "--xla_enable_async_collective_permute=true",
    "--xla_tpu_data_parallel_opt_different_sized_ops=true",
)


def enable_collective_overlap(force: bool = False) -> bool:
    """Append the overlap flags to XLA_FLAGS. OPT-IN: set ZG2_OVERLAP=1
    (or force=True) — the --xla_tpu_* flags are registered by the TPU
    plugin on real pod hosts, but client-only XLA builds (e.g. the axon
    tunnel) hard-abort on unknown XLA_FLAGS ("Unknown flags in
    XLA_FLAGS", measured), so they cannot be defaulted on. Returns False
    (no-op, with a warning) if not opted in or if the XLA backend is
    already initialized — the flags must be set before first device use.
    Idempotent."""
    if not force and os.environ.get("ZG2_OVERLAP") != "1":
        log.info(
            "collective-overlap flags not applied (opt in with ZG2_OVERLAP=1 "
            "on hosts whose XLA registers the TPU plugin flags)"
        )
        return False
    flags = os.environ.get("XLA_FLAGS", "")
    # Match by WHOLE flag name so an explicit user override (e.g. ...=false
    # for an A/B experiment) is respected instead of fought with a
    # duplicate. Substring matching would break on prefix-named flags:
    # --xla_tpu_enable_async_collective_fusion is a prefix of its
    # ..._fuse_all_gather and ..._multiple_steps siblings.
    present = {t.split("=")[0] for t in flags.split()}
    missing = [f for f in OVERLAP_FLAGS if f.split("=")[0] not in present]
    if not missing:
        return True
    try:
        initialized = jax._src.xla_bridge._backends  # noqa: SLF001
    except Exception:
        initialized = {}
    if initialized:
        log.warning(
            "XLA backend already initialized; collective-overlap flags "
            "ignored — set them before the first jax device call"
        )
        return False
    os.environ["XLA_FLAGS"] = " ".join([flags, *missing]).strip()
    return True


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
        if jax.distributed.is_initialized():  # idempotent re-entry
            return
    except AttributeError:  # older jax
        pass
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

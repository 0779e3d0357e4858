"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no multi-chip hardware needed —
SURVEY.md §4 "How the new framework tests multi-node without a cluster").
Must set env before the first jax import.
"""

import os

# bench.py's unreachable-TPU subprocess probe can't see the programmatic
# platform override below — skip it for every in-process bench test.
os.environ.setdefault("ZG2_BENCH_NO_PROBE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's axon sitecustomize force-registers the TPU platform and
# rewrites jax_platforms to "axon,cpu" at interpreter start, so the env var
# alone can't opt out — override the config after import (before any backend
# is initialized). ZG2_TEST_TPU=1 keeps the real chip for the TPU-only
# kernel tests (e.g. tests/test_sampling_kernel.py — native PRNG has no
# CPU lowering); run those serially, one TPU process at a time.
if os.environ.get("ZG2_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# FP32 parity with the PyTorch oracle requires un-fused, highest-precision
# matmuls (SURVEY.md §7 hard part 1).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Multi-PROCESS execution tests (SURVEY.md §2.4).

Everything else in the suite is single-process GSPMD over virtual devices;
this file spawns two real OS processes that each own 4 virtual CPU devices,
wires them with ``parallel.distributed.initialize`` (coordination service +
Gloo transport — the CPU stand-in for a pod's ICI/DCN), and checks that

- a reduction over a model axis spanning both processes produces the right
  value (i.e. a cross-process collective actually executed), and
- one greedy engine run over the global 1x8 mesh matches the
  single-process meshless engine token-for-token.

The unit-level guards on ``initialize`` (timeouts, single-process no-op)
live in test_sharding.py; this is the execution evidence.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import pytest

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import InferenceEngine

WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_psum_and_sharded_decode(tmp_path):
    port = _free_port()
    out = tmp_path / "proc0.json"
    env = dict(os.environ)
    # Workers must build their own backend: drop the parent's virtual-device
    # count (workers set 4 each) and any inherited platform pin.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    repo = str(Path(__file__).parent.parent)
    # Workers import the package by name; don't depend on the editable
    # install being present in the venv (it vanished once mid-round).
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(port), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout)
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{logs[i]}"
        )

    got = json.loads(out.read_text())
    assert got["psum"] == 28.0

    # Single-process meshless greedy reference, same deterministic model.
    params = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
    engine = InferenceEngine(GPT2_NANO, params, batch_size=1, max_seq=32,
                             prompt_buckets=(8,))
    want = engine.generate([1, 2, 3, 4], max_new_tokens=6,
                           sampling=SamplingConfig(temperature=0.0))
    assert got["tokens"] == want, (got["tokens"], want)

    # Multi-process serving parity: the 2-process batcher streams (plain
    # == speculative, asserted inside the worker) must equal the meshless
    # single-process batcher's, request for request.
    from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

    b = ContinuousBatcher(GPT2_NANO, params, batch_size=2, max_seq=32,
                          prompt_buckets=(8,),
                          sampling=SamplingConfig(temperature=0.0))
    for i in range(3):
        b.submit([1 + i, 2, 3], max_new_tokens=4)
    want_serve = sorted(r.generated for r in b.run())
    assert got["serve"] == want_serve, (got["serve"], want_serve)
    assert got["spec_rounds"] > 0

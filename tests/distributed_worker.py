"""Worker for tests/test_distributed.py — run as a SUBPROCESS, 2 of them.

Each process owns 4 virtual CPU devices; together they form the 8-device
global mesh. This executes the real multi-host path (SURVEY.md §2.4):
``parallel.distributed.initialize`` wires the coordination service, the
global 1x8 mesh spans both processes, and XLA emits CROSS-PROCESS
collectives (Gloo on CPU; ICI/DCN on a pod) from the same sharding
annotations the single-process path uses.

Usage: python distributed_worker.py <process_id> <coordinator_port> <outfile>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
# The engine's fused/packed dispatch keys off the backend; keep the worker
# on the plain jnp paths like the other CPU mesh tests.
os.environ.setdefault("ZG2_SPMD_KERNELS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import GPT2_NANO, SamplingConfig
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.parallel import distributed as pdist
from zig_gpt2_tpu.parallel import mesh as pmesh
from zig_gpt2_tpu.runtime.engine import InferenceEngine


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    outfile = sys.argv[3]

    # The never-executed-before path under test: bounded multi-host init.
    pdist.initialize(f"localhost:{port}", num_processes=2,
                     process_id=process_id, init_timeout_s=120)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    # 1. A cross-process psum: the model axis spans both processes, so the
    # reduction below MUST move data over the inter-process transport.
    mesh = pmesh.make_mesh(1, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(8.0, dtype=jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P(pmesh.MODEL_AXIS)))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(xs)
    psum_val = float(np.asarray(total))
    assert psum_val == 28.0, psum_val

    # 2. One sharded decode: same deterministic nano model both processes,
    # TP=8 over the global mesh, greedy tokens via the user-facing engine.
    params = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))
    engine = InferenceEngine(
        GPT2_NANO, params, batch_size=1, max_seq=32, prompt_buckets=(8,),
        mesh=mesh,
    )
    assert engine.config.spmd and engine.config.mesh is mesh
    tokens = engine.generate([1, 2, 3, 4], max_new_tokens=6,
                             sampling=SamplingConfig(temperature=0.0))

    # 3. The step-level manual-SPMD decode over the SAME 2-process mesh:
    # the shard_map body's hand-placed collectives (embedding psum,
    # row-parallel psums, sampler argmax all-gather) now cross the process
    # boundary. Must be token-identical to the GSPMD engine above.
    os.environ["ZG2_STEP_SPMD"] = "1"
    try:
        step_engine = InferenceEngine(
            GPT2_NANO, params, batch_size=1, max_seq=32, prompt_buckets=(8,),
            mesh=mesh,
        )
        step_tokens = step_engine.generate(
            [1, 2, 3, 4], max_new_tokens=6,
            sampling=SamplingConfig(temperature=0.0),
        )
    finally:
        del os.environ["ZG2_STEP_SPMD"]
    assert step_tokens == tokens, (step_tokens, tokens)

    # 4. Multi-process SERVING (SURVEY §7 hard part 5): the continuous
    # batcher's host-side scheduler runs in BOTH processes — identical
    # submissions -> identical (replicated, dp=1) device results ->
    # identical admissions/retirements — while every decode chunk's
    # collectives cross the process boundary in lockstep.
    from zig_gpt2_tpu.runtime.batcher import ContinuousBatcher

    batcher = ContinuousBatcher(
        GPT2_NANO, params, batch_size=2, max_seq=32, prompt_buckets=(8,),
        sampling=SamplingConfig(temperature=0.0), mesh=mesh)
    for i in range(3):  # 3 requests / 2 slots: a refill crosses a step
        batcher.submit([1 + i, 2, 3], max_new_tokens=4)
    bdone = batcher.run()
    assert len(bdone) == 3 and all(len(r.generated) == 4 for r in bdone)
    serve_tokens = {tuple(r.prompt_ids): tuple(r.generated) for r in bdone}

    # 5. Speculative serving cross-process: the GSPMD extend round's
    # collectives span both processes; streams must match plain serving.
    spec = ContinuousBatcher(
        GPT2_NANO, params, batch_size=2, max_seq=32, prompt_buckets=(8,),
        sampling=SamplingConfig(temperature=0.0), mesh=mesh,
        speculative="ngram", spec_k=2)
    for i in range(3):
        spec.submit([1 + i, 2, 3], max_new_tokens=4)
    sdone = spec.run()
    spec_tokens = {tuple(r.prompt_ids): tuple(r.generated) for r in sdone}
    assert spec_tokens == serve_tokens, (spec_tokens, serve_tokens)

    if process_id == 0:
        with open(outfile, "w") as f:
            json.dump({"psum": psum_val, "tokens": tokens,
                       "step_tokens": step_tokens,
                       "serve": sorted(map(list, serve_tokens.values())),
                       "spec_rounds": spec.metrics.spec_rounds}, f)
    print(f"proc {process_id}: OK tokens={tokens}", flush=True)


if __name__ == "__main__":
    main()

"""A/B/C on the real chip: fused single-chip vs op-level shard_map(1x1)
vs STEP-LEVEL shard_map(1x1) — VERDICT round-2 item 2's done-criterion
(step path >= 0.97x fused; op-level measured 0.91x on 124M).

Usage: python tools/ab/ab_step.py [model] [batch] [quant|none] [kv|none] [steps]
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import SamplingConfig, get_config
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.parallel import mesh as pmesh
from zig_gpt2_tpu.runtime.engine import InferenceEngine

MODEL = sys.argv[1] if len(sys.argv) > 1 else "124M"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
QUANT = None if len(sys.argv) > 3 and sys.argv[3] == "none" else (
    sys.argv[3] if len(sys.argv) > 3 else "int4")
KVQ = None if len(sys.argv) > 4 and sys.argv[4] == "none" else (
    sys.argv[4] if len(sys.argv) > 4 else "int8")
STEPS = int(sys.argv[5]) if len(sys.argv) > 5 else 64
PROMPT = 64

config = get_config(MODEL)
params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
if QUANT:
    from zig_gpt2_tpu.quant import quantize as q

    params = q.quantize_params(params, mode=QUANT)
rng = np.random.default_rng(0)
prompts = rng.integers(0, config.vocab_size, (B, PROMPT)).astype(np.int32)
sampling = SamplingConfig(temperature=0.8, seed=0)


def run(tag, mesh, step_env):
    if step_env is None:
        os.environ.pop("ZG2_STEP_SPMD", None)
    else:
        os.environ["ZG2_STEP_SPMD"] = step_env
    eng = InferenceEngine(config, params, batch_size=B,
                          max_seq=PROMPT + STEPS, prompt_buckets=(PROMPT,),
                          kv_quant=KVQ, mesh=mesh)
    eng.generate_scan(prompts, [PROMPT] * B, STEPS, sampling)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.generate_scan(prompts, [PROMPT] * B, STEPS, sampling)
        assert out.shape == (B, STEPS)
        best = min(best, time.perf_counter() - t0)
    tps = B * STEPS / best
    print(f"{tag}: {tps:.1f} tok/s ({best / STEPS * 1000:.3f} ms/step)",
          flush=True)
    return tps


a = run("fused    (single-chip path)", None, None)
m1 = pmesh.make_mesh(1, 1)
b = run("op-level (1x1, ZG2_STEP_SPMD=0)", m1, "0")
c = run("step     (1x1, step-level)     ", m1, "1")
print(f"ratio op/fused   = {b / a:.3f}")
print(f"ratio step/fused = {c / a:.3f}")
print("alldone")

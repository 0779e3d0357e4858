"""A/B: fused single-chip kernels vs shard_map(1x1) kernel path, real TPU.

Validates VERDICT item 2's done-criterion: a 1-device shard_map step must
match current kernel perf (so multi-chip doesn't regress per-chip).
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import SamplingConfig, get_config
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.parallel import mesh as pmesh
from zig_gpt2_tpu.quant import quantize as q
from zig_gpt2_tpu.runtime.engine import InferenceEngine

MODEL = sys.argv[1] if len(sys.argv) > 1 else "1558M"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
STEPS = 64
PROMPT = 64

config = get_config(MODEL)
params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
params = q.quantize_params(params, mode="int4")
rng = np.random.default_rng(0)
prompts = rng.integers(0, config.vocab_size, (B, PROMPT)).astype(np.int32)
sampling = SamplingConfig(temperature=0.8, seed=0)


def run(tag, cfg, mesh):
    eng = InferenceEngine(cfg, params, batch_size=B, max_seq=PROMPT + STEPS,
                          prompt_buckets=(PROMPT,), kv_quant="int8",
                          mesh=mesh)
    eng.generate_scan(prompts, [PROMPT] * B, STEPS, sampling)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.generate_scan(prompts, [PROMPT] * B, STEPS, sampling)
        assert out.shape == (B, STEPS)
        best = min(best, time.perf_counter() - t0)
    tps = B * STEPS / best
    print(f"{tag}: {tps:.1f} tok/s ({best / STEPS * 1000:.3f} ms/step)")
    return tps


a = run("fused   (single-chip path)", config, mesh=None)

mesh = pmesh.make_mesh(1, 1)
cfg_sm = dataclasses.replace(config, spmd=True, mesh=mesh)
b = run("shardmap(1x1 mesh path)  ", cfg_sm, mesh=mesh)
print(f"ratio shardmap/fused = {b / a:.3f}")

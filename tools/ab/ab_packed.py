"""Same-session A/B: head-pair-packed KV cache vs unpacked, one process.

Usage: python tools/ab/ab_packed.py [model] [batch] [quant|none] [kvquant|none] [steps]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from zig_gpt2_tpu.config import SamplingConfig, get_config
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import InferenceEngine

model = sys.argv[1] if len(sys.argv) > 1 else "1558M"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
quant = sys.argv[3] if len(sys.argv) > 3 else "int4"
kvq = sys.argv[4] if len(sys.argv) > 4 else "int8"
steps = int(sys.argv[5]) if len(sys.argv) > 5 else 128
if quant == "none":
    quant = None
if kvq == "none":
    kvq = None
prompt = 64

config = get_config(model)
params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
if quant:
    from zig_gpt2_tpu.quant import quantize as q

    params = q.quantize_params(params, mode=quant)

rng = np.random.default_rng(0)
toks = rng.integers(0, config.vocab_size, (B, prompt)).astype(np.int32)
lengths = [prompt] * B
samp = SamplingConfig(temperature=0.8)

results = {}
for name, flag in (("unpacked", "0"), ("packed", "1")):
    os.environ["ZG2_KV_PACKED"] = flag
    # Explicit max_seq: the engine's context_size default gives S=1031,
    # where the packed single-chunk kernel scoped-VMEM OOMs (see
    # tools/ab/vmem_sweep.py) — match bench.py's shape instead.
    eng = InferenceEngine(config, params, batch_size=B, kv_quant=kvq,
                          max_seq=prompt + steps, prompt_buckets=(prompt,))
    assert eng.config.kv_packed == (flag == "1"), eng.config.kv_packed
    out = eng.generate_scan(toks, lengths, steps, samp)  # warm + compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.generate_scan(toks, lengths, steps, samp)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    tok_s = B * steps / best
    results[name] = round(tok_s, 1)
    print(f"{name}: {tok_s:.1f} tok/s ({1000*best/steps:.3f} ms/step)",
          flush=True)

results["speedup"] = round(results["packed"] / results["unpacked"], 3)
print(json.dumps({"model": model, "B": B, "quant": quant, "kv": kvq,
                  **results}))

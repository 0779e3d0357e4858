"""Same-session grid A/B for the GRADED config (1.5B INT4+INT8KV B=1):
ZG2_KV_PACKED x ZG2_DECODE_UNROLL. Round-4 saw packed-on/u4 at 215.5 tok/s
vs packed-off/u12 at 169.9 across sessions — this pins the combo
back-to-back in ONE process.

Usage: python tools/ab/ab_b1grid.py [model] [quant] [kvquant] [steps]
"""
import itertools
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
quant = sys.argv[2] if len(sys.argv) > 2 else "int4"
kvq = sys.argv[3] if len(sys.argv) > 3 else "int8"
steps = int(sys.argv[4]) if len(sys.argv) > 4 else 128
prompt, B = 64, 1

config = get_config(model)
params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
if quant != "none":
    from zig_gpt2_tpu.quant import quantize as q

    params = q.quantize_params(params, mode=quant)

rng = np.random.default_rng(0)
toks = rng.integers(0, config.vocab_size, (B, prompt)).astype(np.int32)
lengths = [prompt] * B
samp = SamplingConfig(temperature=0.8)

for packed, unroll in itertools.product(("0", "1"), ("4", "12")):
    os.environ["ZG2_KV_PACKED"] = packed
    os.environ["ZG2_DECODE_UNROLL"] = unroll
    eng = InferenceEngine(config, params, batch_size=B,
                          max_seq=prompt + steps, prompt_buckets=(prompt,),
                          kv_quant=None if kvq == "none" else kvq)
    eng.generate_scan(toks, lengths, steps, samp)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.generate_scan(toks, lengths, steps, samp)
        assert out.shape == (B, steps)
        best = min(best, time.perf_counter() - t0)
    print(f"packed={packed} unroll={unroll:>2}: {B*steps/best:7.1f} tok/s "
          f"({1000*best/steps:.3f} ms/step)", flush=True)
print("alldone")

"""Same-session A/B grid on the real chip: wmm (float GEMV kernel) x
kv_packed, bf16 decode — attribution for the graded headline (VERDICT
round-2 item 6).

Usage: python tools/ab/ab_wmm.py [model] [batch] [steps]
"""
import itertools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import SamplingConfig, get_config
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import InferenceEngine

MODEL = sys.argv[1] if len(sys.argv) > 1 else "124M"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
PROMPT = 64

config = get_config(MODEL)
params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
rng = np.random.default_rng(0)
prompts = rng.integers(0, config.vocab_size, (B, PROMPT)).astype(np.int32)
sampling = SamplingConfig(temperature=0.8, seed=0)

for wmm, packed in itertools.product(("0", "1"), ("0", "1")):
    os.environ["ZG2_WMM"] = wmm
    os.environ["ZG2_KV_PACKED"] = packed
    eng = InferenceEngine(config, params, batch_size=B,
                          max_seq=PROMPT + STEPS, prompt_buckets=(PROMPT,))
    eng.generate_scan(prompts, [PROMPT] * B, STEPS, sampling)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.generate_scan(prompts, [PROMPT] * B, STEPS, sampling)
        assert out.shape == (B, STEPS)
        best = min(best, time.perf_counter() - t0)
    tps = B * STEPS / best
    print(f"wmm={wmm} packed={packed}: {tps:.1f} tok/s "
          f"({best / STEPS * 1000:.3f} ms/step)", flush=True)
print("alldone")

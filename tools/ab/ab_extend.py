"""Verify-pass cost curve on the real chip: gpt2.extend time vs window
size T, against the plain decode step — the speculative-decoding breakeven
in one table (VERDICT r03 item 2: "a measured, not modeled, statement of
when speculation wins").

A speculative round with k proposals costs ~extend(k+1) (+ ~zero for ngram
proposals, + k draft steps for a model draft) and commits tokens_per_round
tokens; plain decode costs decode_ms per token. So speculation wins iff
    tokens_per_round > extend(k+1)_ms / decode_ms   (ngram mode)
and the printed `breakeven_tpr` column is exactly that threshold.

Timing rule (CLAUDE.md): loop n iterations inside ONE lax.scan whose body
consumes the full output (length rewind keeps the cache state fixed so the
scan is steady-state), sync via np.asarray.

Usage: python tools/ab/ab_extend.py [model] [quant] [kv_quant] [batch] [S]
Defaults: 1558M int4 int8 1 512.
"""
import functools
import os
import sys
import time

from zig_gpt2_tpu.utils.platform import apply_platform_override

apply_platform_override()  # ZG2_PLATFORM=cpu for off-chip smoke runs

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import get_config
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.runtime.engine import cache_formats

MODEL = sys.argv[1] if len(sys.argv) > 1 else "1558M"
QUANT = sys.argv[2] if len(sys.argv) > 2 else "int4"
KV = sys.argv[3] if len(sys.argv) > 3 else "int8"
B = int(sys.argv[4]) if len(sys.argv) > 4 else 1
S = int(sys.argv[5]) if len(sys.argv) > 5 else 512
# n >= 2000 inside ONE scan (CLAUDE.md): the fixed ~30-40 ms dispatch+sync
# must amortize to < 0.1% of even a ~1 ms (124M) per-iteration op, or the
# breakeven ratio is biased toward 1 by (e+c)/(d+c).
ITERS = int(os.environ.get("ZG2_AB_ITERS", "2000"))
MAX_T = 64 // B  # the stacked-GEMV 64-row bound

config = get_config(MODEL)
params = gpt2.init_params(config, jax.random.PRNGKey(0), jnp.bfloat16)
if QUANT != "none":
    from zig_gpt2_tpu.quant import quantize as q

    params = q.quantize_params(params, mode=QUANT)
kv = None if KV == "none" else KV

# One cache, prefilled to S valid rows, with MAX_T headroom.
rows = S + MAX_T
cache0 = gpt2.init_kv_cache(config, B, rows, dtype=jnp.bfloat16, quant=kv)
fmt = cache_formats(jax.eval_shape(lambda: cache0))
if fmt is not None:
    cache0 = jax.tree.map(jax.device_put, cache0, fmt)
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, config.vocab_size, (B, S)), jnp.int32)
lens = jnp.full((B,), S, jnp.int32)
cache0, _ = jax.jit(
    functools.partial(gpt2.prefill, config=config), donate_argnums=(1,),
    out_shardings=(fmt, None),
)(params, cache0, prompt, lens)


def timed(fn, *args):
    out = fn(*args)  # compile + warm
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(2):  # ITERS=2000 already averages; 2 reps guard drift
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0  # ms per inner iteration


# Plain decode step, steady-state (length rewound each iteration).
@jax.jit
def loop_decode(params, cache, tok):
    base = cache["length"]

    def body(carry, _):
        cache, s = carry
        cache, lg = gpt2.decode_step(params, cache, tok, config)
        cache = dict(cache, length=base)  # rewind: fixed shapes, fixed state
        return (cache, s + jnp.sum(lg)), None

    (cache, s), _ = jax.lax.scan(body, (cache, 0.0), None, length=ITERS)
    return s


decode_ms = timed(loop_decode, params, cache0,
                  jnp.zeros((B,), jnp.int32))
print(f"decode_step: {decode_ms:.3f} ms  (B={B}, S={S}, {QUANT}+kv{KV})",
      flush=True)

for T in (2, 3, 5, 9):
    if T > MAX_T:
        break
    wt = jnp.asarray(rng.integers(0, config.vocab_size, (B, T)), jnp.int32)
    vt = jnp.full((B,), T, jnp.int32)

    @jax.jit
    def loop_extend(params, cache, wt, vt, T=T):
        base = cache["length"]

        def body(carry, _):
            cache, s = carry
            cache, lg = gpt2.extend(params, cache, wt, vt, config)
            cache = dict(cache, length=base)
            return (cache, s + jnp.sum(lg)), None

        (cache, s), _ = jax.lax.scan(body, (cache, 0.0), None, length=ITERS)
        return s

    ext_ms = timed(loop_extend, params, cache0, wt, vt)
    k = T - 1
    print(f"extend T={T} (k={k}): {ext_ms:.3f} ms  "
          f"x{ext_ms / decode_ms:.2f} of a decode step  "
          f"breakeven_tpr={ext_ms / decode_ms:.2f}", flush=True)
print("alldone")

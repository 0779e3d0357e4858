"""End-to-end model parity tests: JAX model vs PyTorch oracle, and the
prefill+decode KV-cache path vs the full-sequence path.

The reference left end-to-end logits parity unwired (SURVEY.md §4); here it
is the core of the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.tools import oracle
from tests.tolerance import assert_logits_close

CFG = GPT2_NANO


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(CFG, jax.random.PRNGKey(42))


@pytest.fixture(scope="module")
def params_np(params):
    return jax.tree.map(np.asarray, params)


def test_forward_matches_oracle(params, params_np):
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, CFG.vocab_size, size=(2, 17))
    expected = oracle.forward(params_np, tokens, CFG)
    actual = gpt2.forward(params, jnp.asarray(tokens), CFG)
    assert_logits_close(actual, expected, msg="full forward logits")


def test_prefill_decode_matches_forward(params):
    """prefill + N decode steps produce the same logits as one full-sequence
    forward (cache-decode ≡ full-context attention at the model level)."""
    rng = np.random.default_rng(2)
    B, T_prompt, T_total = 2, 7, 13
    tokens = rng.integers(0, CFG.vocab_size, size=(B, T_total))
    full_logits = np.asarray(gpt2.forward(params, jnp.asarray(tokens), CFG))

    cache = gpt2.init_kv_cache(CFG, batch_size=B, max_seq=32)
    lengths = jnp.asarray([T_prompt] * B, jnp.int32)
    cache, logits = gpt2.prefill(params, cache, jnp.asarray(tokens[:, :T_prompt]), lengths, CFG)
    assert_logits_close(logits, full_logits[:, T_prompt - 1], msg="prefill last logits")

    for t in range(T_prompt, T_total):
        cache, logits = gpt2.decode_step(params, cache, jnp.asarray(tokens[:, t]), CFG)
        assert_logits_close(logits, full_logits[:, t], msg=f"decode logits @ {t}")
    np.testing.assert_array_equal(np.asarray(cache["length"]), [T_total] * B)


def test_prefill_ragged_lengths(params):
    """Padded batched prefill: each sequence's last-position logits must match
    an unpadded single-sequence run."""
    rng = np.random.default_rng(3)
    lens = [4, 9]
    T = max(lens)
    tokens = rng.integers(0, CFG.vocab_size, size=(2, T))
    cache = gpt2.init_kv_cache(CFG, batch_size=2, max_seq=16)
    cache, logits = gpt2.prefill(
        params, cache, jnp.asarray(tokens), jnp.asarray(lens, jnp.int32), CFG
    )
    for b, L in enumerate(lens):
        single = gpt2.forward(params, jnp.asarray(tokens[b : b + 1, :L]), CFG)
        assert_logits_close(logits[b], np.asarray(single)[0, -1], msg=f"ragged prefill b={b}")


def test_decode_step_jitted_with_donation(params):
    """The jitted, cache-donating decode step gives identical results."""
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, CFG.vocab_size, size=(1, 5))
    cache = gpt2.init_kv_cache(CFG, batch_size=1, max_seq=16)
    cache, _ = gpt2.prefill(params, cache, jnp.asarray(tokens), jnp.asarray([5], jnp.int32), CFG)

    eager_cache = jax.tree.map(jnp.copy, cache)
    step = gpt2.make_decode_step(CFG)
    tok = jnp.asarray([3], jnp.int32)
    eager_cache, eager_logits = gpt2.decode_step(params, eager_cache, tok, CFG)
    jit_cache, jit_logits = step(params, cache, tok)  # donates `cache`
    assert_logits_close(jit_logits, np.asarray(eager_logits), msg="jit vs eager decode")
    assert int(jit_cache["length"][0]) == 6


def test_weight_tying(params, params_np):
    """lm_head must literally reuse wte (main.zig:312) — perturbing wte must
    change the logits projection."""
    tokens = np.asarray([[1, 2, 3]])
    base = oracle.forward(params_np, tokens, CFG)
    p2 = dict(params_np)
    p2["wte"] = params_np["wte"] + 0.01
    bumped = oracle.forward(p2, tokens, CFG)
    assert np.abs(base - bumped).max() > 0


def test_remat_forward_and_grads_match(rng):
    """jax.checkpoint'd blocks must not change values or gradients."""
    from zig_gpt2_tpu import train
    from zig_gpt2_tpu.config import GPT2_NANO

    params = gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(3))
    tokens = jnp.asarray(rng.integers(0, GPT2_NANO.vocab_size, (2, 16)), jnp.int32)
    logits = gpt2.forward(params, tokens, GPT2_NANO)
    logits_r = gpt2.forward(params, tokens, GPT2_NANO, remat=True)
    np.testing.assert_allclose(np.asarray(logits_r), np.asarray(logits), rtol=1e-6)

    g = jax.grad(train.loss_fn)(params, tokens, GPT2_NANO)
    gr = jax.grad(lambda p, t, c: train.loss_fn(p, t, c, remat=True))(
        params, tokens, GPT2_NANO
    )
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("quant", [None, "int8"])
@pytest.mark.parametrize("packed", [False, True])
def test_uniform_pos_append_bit_identical(params, quant, packed):
    """config.uniform_pos (ONE batch-spanning dus per cache array, used when
    every lane shares a position) must be bit-identical to the per-lane
    unrolled appends — same cache bytes, same logits, every step."""
    import dataclasses

    rng = np.random.default_rng(7)
    B, T_prompt, steps = 3, 5, 4
    tokens = rng.integers(0, CFG.vocab_size, size=(B, T_prompt + steps))
    base = dataclasses.replace(CFG, kv_packed=packed)
    uni = dataclasses.replace(base, uniform_pos=True)

    lengths = jnp.asarray([T_prompt] * B, jnp.int32)
    cache0 = gpt2.init_kv_cache(base, batch_size=B, max_seq=32, quant=quant)
    cache0, _ = gpt2.prefill(params, cache0, jnp.asarray(tokens[:, :T_prompt]),
                             lengths, base)
    caches = {False: cache0, True: jax.tree.map(jnp.copy, cache0)}
    for t in range(T_prompt, T_prompt + steps):
        tok = jnp.asarray(tokens[:, t])
        logits = {}
        for flag, cfg in ((False, base), (True, uni)):
            caches[flag], logits[flag] = gpt2.decode_step(
                params, caches[flag], tok, cfg)
        np.testing.assert_array_equal(
            np.asarray(logits[True]), np.asarray(logits[False]),
            err_msg=f"logits @ step {t}")
        for name in caches[False]:
            np.testing.assert_array_equal(
                np.asarray(caches[True][name]), np.asarray(caches[False][name]),
                err_msg=f"cache[{name}] @ step {t}")

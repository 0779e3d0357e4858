"""Golden parity tests for every op against the PyTorch oracle.

Mirrors the reference's test inventory (tests.zig: Linear w/ and w/o bias,
Embedding, LayerNorm, gelu, softmax, attention) but computes golden data
in-process with fixed seeds instead of pre-dumped files.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from zig_gpt2_tpu.ops import layers as ops
from tests.tolerance import assert_tensors_close


def test_linear_with_bias(rng):
    x = rng.standard_normal((4, 96), dtype=np.float32)
    w = rng.standard_normal((96, 160), dtype=np.float32)
    b = rng.standard_normal((160,), dtype=np.float32)
    expected = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
    actual = ops.linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    assert_tensors_close(actual, expected.numpy(), msg="linear+bias")


def test_linear_no_bias(rng):
    # Bias-less path: the tied lm_head (main.zig:312).
    x = rng.standard_normal((4, 96), dtype=np.float32)
    w = rng.standard_normal((96, 160), dtype=np.float32)
    expected = torch.from_numpy(x) @ torch.from_numpy(w)
    actual = ops.linear(jnp.asarray(x), jnp.asarray(w))
    assert_tensors_close(actual, expected.numpy(), msg="linear")


def test_embedding(rng):
    weight = rng.standard_normal((50, 16), dtype=np.float32)
    idxs = rng.integers(0, 50, size=(7,))
    actual = ops.embedding(jnp.asarray(idxs), jnp.asarray(weight))
    assert_tensors_close(actual, weight[idxs], msg="embedding")


def test_layer_norm(rng):
    x = rng.standard_normal((5, 64), dtype=np.float32)
    w = rng.standard_normal((64,), dtype=np.float32)
    b = rng.standard_normal((64,), dtype=np.float32)
    expected = F.layer_norm(
        torch.from_numpy(x), (64,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-5
    )
    actual = ops.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    assert_tensors_close(actual, expected.numpy(), msg="layer_norm")


def test_gelu(rng):
    x = rng.standard_normal((3, 128), dtype=np.float32) * 3
    expected = F.gelu(torch.from_numpy(x), approximate="tanh")
    actual = ops.gelu(jnp.asarray(x))
    assert_tensors_close(actual, expected.numpy(), msg="gelu")


def test_softmax(rng):
    x = rng.standard_normal((6, 100), dtype=np.float32) * 5
    expected = F.softmax(torch.from_numpy(x), dim=-1)
    actual = ops.softmax(jnp.asarray(x))
    assert_tensors_close(actual, expected.numpy(), msg="softmax")


def test_causal_attention_vs_torch_sdpa(rng):
    B, H, T, D = 2, 4, 24, 16
    q = rng.standard_normal((B, H, T, D), dtype=np.float32)
    k = rng.standard_normal((B, H, T, D), dtype=np.float32)
    v = rng.standard_normal((B, H, T, D), dtype=np.float32)
    expected = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    )
    actual = ops.causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert_tensors_close(actual, expected.numpy(), msg="causal_attention")


def test_decode_attention_matches_full_attention(rng):
    """KV-cached decode ≡ full-context attention, step by step — the key
    equivalence test (reference: tests.zig:316-333)."""
    B, H, T, D, MAX = 2, 4, 9, 16, 32
    q_all = rng.standard_normal((B, H, T, D), dtype=np.float32)
    k_all = rng.standard_normal((B, H, T, D), dtype=np.float32)
    v_all = rng.standard_normal((B, H, T, D), dtype=np.float32)
    full = F.scaled_dot_product_attention(
        torch.from_numpy(q_all), torch.from_numpy(k_all), torch.from_numpy(v_all),
        is_causal=True,
    ).numpy()

    k_cache = np.zeros((B, H, MAX, D), np.float32)
    v_cache = np.zeros((B, H, MAX, D), np.float32)
    for t in range(T):
        k_cache[:, :, t] = k_all[:, :, t]
        v_cache[:, :, t] = v_all[:, :, t]
        # Garbage in unused rows must not affect the result.
        k_cache[:, :, t + 1 :] = 1e9
        v_cache[:, :, t + 1 :] = -1e9
        out = ops.decode_attention(
            jnp.asarray(q_all[:, :, t]),
            jnp.asarray(k_cache),
            jnp.asarray(v_cache),
            jnp.asarray([t + 1] * B, dtype=jnp.int32),
        )
        assert_tensors_close(out, full[:, :, t], msg=f"decode step {t}")


def test_decode_attention_scalar_length(rng):
    B, H, D, MAX = 1, 2, 8, 16
    q = rng.standard_normal((B, H, D), dtype=np.float32)
    k = rng.standard_normal((B, H, MAX, D), dtype=np.float32)
    v = rng.standard_normal((B, H, MAX, D), dtype=np.float32)
    a = ops.decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 5)
    b = ops.decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray([5], jnp.int32)
    )
    assert_tensors_close(a, np.asarray(b), msg="scalar vs vector length")

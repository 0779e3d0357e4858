"""Fused decode-attention Pallas kernel parity vs the jnp reference
(interpret mode on CPU; the real lowering is exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.ops import attention as fused
from zig_gpt2_tpu.ops import layers as ops


def _mk(rng, b, h, s, d, dtype=np.float32):
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32).astype(dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32).astype(dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32).astype(dtype)
    return q, k, v


@pytest.mark.parametrize("lengths", [[9, 16], [1, 5]])
def test_fp_parity(rng, lengths):
    B, H, S, D = 2, 4, 16, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray(lengths, jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = fused.decode_attention_fused(q, k, v, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fp_scalar_length(rng):
    B, H, S, D = 1, 2, 8, 64
    q, k, v = _mk(rng, B, H, S, D)
    want = ops.decode_attention(q, k, v, jnp.int32(5))
    got = fused.decode_attention_fused(q, k, v, jnp.int32(5), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_quant_parity(rng):
    B, H, S, D = 2, 3, 16, 64
    q, kf, vf = _mk(rng, B, H, S, D)
    kq, ks = ops.quantize_kv(kf)
    vq, vs = ops.quantize_kv(vf)
    length = jnp.asarray([10, 16], jnp.int32)
    want = ops.decode_attention_quant(q, kq, ks, vq, vs, length)
    got = fused.decode_attention_quant_fused(
        q, kq, ks, vq, vs, length, interpret=True
    )
    # Same math, same bf16 operand dots; only reduction order may differ.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3)


def test_garbage_beyond_length_ignored(rng):
    """Rows >= length must not leak into the output (mask inside kernel)."""
    B, H, S, D = 1, 2, 8, 64
    q, k, v = _mk(rng, B, H, S, D)
    length = jnp.asarray([4], jnp.int32)
    base = fused.decode_attention_fused(q, k, v, length, interpret=True)
    k2 = k.at[:, :, 4:].set(1e9)
    v2 = v.at[:, :, 4:].set(-1e9)
    got = fused.decode_attention_fused(q, k2, v2, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=1e-6)


def test_bf16_io(rng):
    B, H, S, D = 2, 2, 16, 64
    q, k, v = _mk(rng, B, H, S, D, dtype=jnp.bfloat16)
    length = jnp.asarray([7, 12], jnp.int32)
    want = ops.decode_attention(q, k, v, length)
    got = fused.decode_attention_fused(q, k, v, length, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )

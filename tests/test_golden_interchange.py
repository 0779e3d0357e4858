"""Golden-file interchange with the reference test suite (C18).

The generator must emit exactly the file set the reference's Zig tests
consume (/root/reference/generate_test_data.py name_to_tensor keys, read by
tests.zig), and those files — loaded back through utils.io with
caller-supplied shapes, exactly how ops.zig:309-320 reads them — must
validate OUR ops under the reference tolerance policy (tests.zig:4-20).

The attention goldens additionally prove incremental KV-cache decode ≡
full-sequence masked attention (the reference's key test, tests.zig:316-333)
on reference-formatted data.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.ops import layers as ops
from zig_gpt2_tpu.tools.generate_test_data import (
    REFERENCE_FILE_SET,
    write_golden_files,
)
from zig_gpt2_tpu.utils.io import load_tensor
from tests.tolerance import assert_tensors_close

# GEMM-backed goldens compare torch CPU sgemm against XLA dot — different
# reduction orders put near-cancellations a few ulp apart (PARITY.md
# measured floor ~6e-6 on full-model logits). Elementwise ops keep the
# strict reference abs tol 5e-7; GEMM checks get a 2e-6 absolute floor
# (the relative regime is untouched).
GEMM_ABS = 2e-6

B, E = 3, 768
T, H, D = 5, 12, 64
N = H * D


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    out = tmp_path_factory.mktemp("golden")
    shapes = write_golden_files(out, seed=0)
    return out, shapes


def test_reference_file_set_covered(golden):
    out, shapes = golden
    missing = REFERENCE_FILE_SET - set(shapes)
    assert not missing, f"reference goldens not emitted: {sorted(missing)}"
    on_disk = {p.name for p in out.iterdir()}
    assert REFERENCE_FILE_SET <= on_disk


def test_linear_goldens(golden):
    out, _ = golden
    x = load_tensor(out / "linear_inputs", (B, E))
    w = load_tensor(out / "linear_weight", (4 * E, E))  # nn.Linear (out, in)
    b = load_tensor(out / "linear_bias", (4 * E,))
    got = np.asarray(ops.linear(jnp.asarray(x), jnp.asarray(w.T.copy()),
                                jnp.asarray(b)))
    assert_tensors_close(got, load_tensor(out / "linear_outputs", (B, 4 * E)),
                         abs_tol=GEMM_ABS, msg="linear")
    got_nb = np.asarray(ops.linear(jnp.asarray(x), jnp.asarray(w.T.copy())))
    assert_tensors_close(
        got_nb, load_tensor(out / "linear_outputs_no_bias", (B, 4 * E)),
        abs_tol=GEMM_ABS, msg="linear_no_bias",
    )


def test_gelu_softmax_layernorm_goldens(golden):
    out, _ = golden
    g = load_tensor(out / "gelu_inputs", (B, E))
    assert_tensors_close(np.asarray(ops.gelu(jnp.asarray(g))),
                         load_tensor(out / "gelu_outputs", (B, E)), msg="gelu")
    s = load_tensor(out / "softmax_inputs", (B, E))
    assert_tensors_close(np.asarray(ops.softmax(jnp.asarray(s))),
                         load_tensor(out / "softmax_outputs", (B, E)),
                         msg="softmax")
    ln_in = load_tensor(out / "layer_norm_inputs", (B, E))
    got = np.asarray(ops.layer_norm(
        jnp.asarray(ln_in),
        jnp.asarray(load_tensor(out / "layer_norm_weight", (E,))),
        jnp.asarray(load_tensor(out / "layer_norm_bias", (E,))),
        eps=1e-5,
    ))
    assert_tensors_close(got, load_tensor(out / "layer_norm_outputs", (B, E)),
                         msg="layer_norm")


def test_embedding_goldens_int64_ids(golden):
    out, _ = golden
    w = load_tensor(out / "embedding_weight", (10, E))
    # The reference dumps RAW INT64 ids (torch.randint default) — tests.zig
    # reads i64; a float32 read here would produce garbage indices.
    idx = load_tensor(out / "embedding_inputs", (B,), dtype=np.int64)
    got = np.asarray(ops.embedding(jnp.asarray(idx, jnp.int32), jnp.asarray(w)))
    assert_tensors_close(got, load_tensor(out / "embedding_outputs", (B, E)),
                         msg="embedding")  # gather: exact


def test_transpose_split_goldens(golden):
    out, _ = golden
    tr = load_tensor(out / "transpose_inputs", (1, T, H, D))
    np.testing.assert_array_equal(
        tr.transpose(0, 2, 1, 3),
        load_tensor(out / "transpose_outputs", (1, H, T, D)),
    )
    sp = load_tensor(out / "split_inputs", (1, T, 3 * N))
    for i, name in enumerate(("split_q", "split_k", "split_v")):
        np.testing.assert_array_equal(
            sp[..., i * N:(i + 1) * N], load_tensor(out / name, (1, T, N))
        )


def test_sdpa_goldens(golden):
    out, _ = golden
    q = jnp.asarray(load_tensor(out / "sdpa_q", (1, H, T, D)))
    k = jnp.asarray(load_tensor(out / "sdpa_k", (1, H, T, D)))
    v = jnp.asarray(load_tensor(out / "sdpa_v", (1, H, T, D)))
    got = np.asarray(ops.causal_attention(q, k, v))
    assert_tensors_close(got, load_tensor(out / "sdpa_outputs", (1, H, T, D)),
                         abs_tol=GEMM_ABS, msg="sdpa")


def test_attention_chain_incremental_decode(golden):
    """Feed attn_inputs one token at a time through OUR KV-cached decode
    attention; every step's c_proj output must match the full-sequence
    golden row (the tests.zig:316-333 incremental-≡-full proof)."""
    out, _ = golden
    a_in = load_tensor(out / "attn_inputs", (1, T, N))
    caw = load_tensor(out / "attn_c_attn_weight", (3 * N, N))
    cab = load_tensor(out / "attn_c_attn_bias", (3 * N,))
    cpw = load_tensor(out / "attn_c_proj_weight", (N, N))
    cpb = load_tensor(out / "attn_c_proj_bias", (N,))
    want = load_tensor(out / "attn_outputs", (1, T, N))

    k_cache = jnp.zeros((1, H, T, D), jnp.float32)
    v_cache = jnp.zeros((1, H, T, D), jnp.float32)
    for t in range(T):
        qkv = a_in[:, t] @ caw.T + cab  # (1, 3N)
        q, k, v = (
            jnp.asarray(part.reshape(1, H, D))
            for part in np.split(qkv, 3, axis=-1)
        )
        k_cache = k_cache.at[:, :, t].set(k)
        v_cache = v_cache.at[:, :, t].set(v)
        attn = np.asarray(
            ops.decode_attention(q, k_cache, v_cache, jnp.int32(t + 1))
        ).reshape(1, N)
        got = attn @ cpw.T + cpb
        assert_tensors_close(got, want[:, t], abs_tol=GEMM_ABS, msg=f"attn step {t}")


def test_sdpa_matches_math(golden):
    """Cross-check the dumped sdpa_outputs against an independent numpy
    evaluation (guards the generator itself)."""
    out, _ = golden
    q = load_tensor(out / "sdpa_q", (1, H, T, D))
    k = load_tensor(out / "sdpa_k", (1, H, T, D))
    v = load_tensor(out / "sdpa_v", (1, H, T, D))
    scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(D)
    mask = np.tril(np.ones((T, T), bool))
    scores = np.where(mask, scores, -np.inf)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    assert_tensors_close(probs @ v,
                         load_tensor(out / "sdpa_outputs", (1, H, T, D)),
                         abs_tol=GEMM_ABS, msg="sdpa generator")

"""Perplexity harness tests (the quantization PPL-gate machinery)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_gpt2_tpu.config import GPT2_NANO
import zig_gpt2_tpu.eval.perplexity as ev
from zig_gpt2_tpu.models import gpt2
from zig_gpt2_tpu.quant import quantize as q


@pytest.fixture(scope="module")
def nano_params():
    return gpt2.init_params(GPT2_NANO, jax.random.PRNGKey(0))


def test_random_model_ppl_near_vocab(nano_params, rng):
    """An untrained (near-uniform-logit) model's PPL is ≈ vocab_size."""
    ids = rng.integers(0, GPT2_NANO.vocab_size, 2000)
    ppl = ev.perplexity(nano_params, GPT2_NANO, ids, window=64, batch_size=4)
    assert 0.5 * GPT2_NANO.vocab_size < ppl < 2.0 * GPT2_NANO.vocab_size


def test_ppl_matches_manual_single_window(nano_params, rng):
    """Harness PPL == hand-computed NLL on one exact window (no padding)."""
    ids = rng.integers(0, GPT2_NANO.vocab_size, 64)
    ppl = ev.perplexity(nano_params, GPT2_NANO, ids, window=64, batch_size=1)
    logits = gpt2.forward(
        nano_params, jnp.asarray(ids[None, :], jnp.int32), GPT2_NANO
    )
    logp = jax.nn.log_softmax(np.asarray(logits[0, :-1], np.float32), axis=-1)
    nll = -logp[np.arange(63), ids[1:]].mean()
    assert math.isclose(ppl, math.exp(nll), rel_tol=1e-4)


def test_padded_tail_excluded(nano_params, rng):
    """A corpus that doesn't fill the last window must not score padding."""
    ids = rng.integers(0, GPT2_NANO.vocab_size, 100)  # 64 + 36
    ppl_padded = ev.perplexity(nano_params, GPT2_NANO, ids, window=64, batch_size=4)
    assert math.isfinite(ppl_padded) and ppl_padded > 1.0
    # Scoring count check: identical corpus, exact-multiple length.
    ids128 = np.concatenate([ids, rng.integers(0, GPT2_NANO.vocab_size, 28)])
    ppl_full = ev.perplexity(nano_params, GPT2_NANO, ids128, window=64, batch_size=4)
    assert math.isfinite(ppl_full)


def test_quantized_ppl_gate_nano(nano_params, rng):
    """INT8 PPL tracks FP32 closely on a nano model + synthetic corpus.

    (The real WikiText-2 gate — Δ≤0.1 @INT8 / Δ≤0.5 @INT4 on GPT-2 weights —
    needs the downloaded corpus + checkpoints; this pins the machinery and
    that quantization error stays small end to end.)"""
    ids = rng.integers(0, GPT2_NANO.vocab_size, 1000)
    qparams = q.quantize_params(nano_params, mode="int8")
    passed, p_fp, p_q = ev.ppl_gate(
        nano_params, qparams, GPT2_NANO, ids, budget=0.05 * GPT2_NANO.vocab_size,
        window=64, batch_size=4,
    )
    assert passed, (p_fp, p_q)
    # Relative PPL drift at INT8 should be well under 1%.
    assert abs(p_q - p_fp) / p_fp < 0.01, (p_fp, p_q)


def test_load_tokens_roundtrip(tmp_path, rng):
    ids = rng.integers(0, 1000, 64).astype(np.int32)
    npy = tmp_path / "corpus.npy"
    np.save(npy, ids)
    np.testing.assert_array_equal(ev.load_tokens(str(npy)), ids)
    binf = tmp_path / "corpus.bin"
    ids.tofile(binf)
    np.testing.assert_array_equal(ev.load_tokens(str(binf)), ids)


def test_ppl_gate_tool_demo(tmp_path, capsys, rng):
    """The one-command gate tool (tools/ppl_gate.py) runs end to end in
    --demo mode and on a .npy corpus with a real table + JSON verdict."""
    import json

    from zig_gpt2_tpu.tools import ppl_gate as tool

    rc = tool.main(["--demo", "--modes", "int8", "--batch", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    verdict = json.loads(out.strip().splitlines()[-1])
    assert verdict["pass"] is True
    modes = [r["mode"] for r in verdict["rows"]]
    assert modes == ["fp32", "int8"]

"""Weight-conversion parity: HuggingFace GPT-2 -> raw checkpoint -> our model.

This closes the loop the reference closes with generate_nano_gpt.py (C19):
an independent GPT-2 implementation (here transformers', which IS the HF
port of OpenAI's weights) produces the same logits from the same converted
checkpoint — catching any transpose / naming / packing mistake in the
conversion chain and any semantic drift in the model itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from zig_gpt2_tpu.config import GPTConfig  # noqa: E402
from zig_gpt2_tpu.models import gpt2  # noqa: E402
from zig_gpt2_tpu.tools import download_weights as dw  # noqa: E402
from zig_gpt2_tpu.utils import io as zio  # noqa: E402

from tolerance import assert_tensors_close  # noqa: E402


@pytest.fixture(scope="module")
def hf_and_ours(tmp_path_factory):
    hf_config = transformers.GPT2Config(
        vocab_size=256, n_positions=64, n_embd=64, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.GPT2LMHeadModel(hf_config).eval()
    out = tmp_path_factory.mktemp("hfconv")
    n = dw.convert_hf_model(hf_model, out)
    assert n == 2 + 2 + 2 * 12  # wte/wpe + ln_f + 12 tensors per block
    config = GPTConfig(vocab_size=256, context_size=64, n_layers=2,
                       n_heads=2, n_embed=64)
    params = zio.load_gpt2_raw(out / "raw", config)
    return hf_model, params, config


def test_logits_parity_full_sequence(hf_and_ours, rng):
    hf_model, params, config = hf_and_ours
    tokens = rng.integers(0, 256, (2, 17)).astype(np.int64)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(
        gpt2.forward(params, jnp.asarray(tokens, jnp.int32), config),
        np.float32,
    )
    # The reference's dual tolerance (tests.zig:4-20).
    assert_tensors_close(got, want)


def test_decode_path_matches_hf_incremental(hf_and_ours, rng):
    """Our KV-cached decode must equal HF's full-sequence forward at every
    step (the key cache-decode ≡ full-attention test, tests.zig:316-333)."""
    hf_model, params, config = hf_and_ours
    prompt = rng.integers(0, 256, 5).astype(np.int64)

    cache = gpt2.init_kv_cache(config, 1, 32)
    cache, logits = gpt2.prefill(
        params, cache, jnp.asarray(prompt[None, :], jnp.int32),
        jnp.asarray([len(prompt)], jnp.int32), config,
    )
    seq = list(prompt)
    for _ in range(4):
        with torch.no_grad():
            want = hf_model(torch.from_numpy(np.asarray([seq]))).logits[0, -1].numpy()
        assert_tensors_close(np.asarray(logits[0], np.float32), want)
        nxt = int(np.argmax(want))
        seq.append(nxt)
        cache, logits = gpt2.decode_step(
            params, cache, jnp.asarray([nxt], jnp.int32), config
        )


def test_byte_encoder_json(tmp_path):
    dw.write_byte_encoder(tmp_path)
    import json

    table = json.loads((tmp_path / "byte_encoder.json").read_text())
    assert len(table) == 256
    assert table["Ġ"] == 32  # space
    assert table["!"] == 33

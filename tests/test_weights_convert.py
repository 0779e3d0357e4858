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


class TestRepackTP:
    """repack --tp bakes head/vocab padding into the quantized npz and
    records it in metadata, so a 'non-divisible' model (5 heads / tp 4 —
    the 1.5B-on-8-chips shape) can serve from a pre-quantized checkpoint
    over a mesh."""

    def test_tp_repack_roundtrip_and_sharded_decode(self, tmp_path, rng):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from zig_gpt2_tpu.config import GPTConfig
        from zig_gpt2_tpu.models import gpt2
        from zig_gpt2_tpu.parallel import mesh as pmesh
        from zig_gpt2_tpu.runtime.engine import InferenceEngine
        from zig_gpt2_tpu.utils import io as zio
        from zig_gpt2_tpu.config import SamplingConfig

        cfg = GPTConfig(vocab_size=500, context_size=64, n_layers=2,
                        n_heads=5, n_embed=160)
        params = gpt2.init_params(cfg, jax.random.PRNGKey(3))
        raw = tmp_path / "raw"
        zio.save_gpt2_raw(params, raw, cfg)

        # The baseline: unpadded fp32 greedy tokens.
        eng0 = InferenceEngine(cfg, params, max_seq=24, prompt_buckets=(8,))
        want = eng0.generate([7, 1, 2], 6, SamplingConfig(temperature=0.0))

        out = tmp_path / "int8_tp4.npz"
        # repack.main resolves --model via get_config; drive the same code
        # path directly for the custom test config instead.
        from zig_gpt2_tpu.parallel import sharding as psh
        from zig_gpt2_tpu.quant import quantize as q

        padded, pcfg = psh.pad_for_tp(
            jax.tree.map(jnp.asarray, zio.load_gpt2_raw(raw, cfg,
                                                        device_put=False)),
            cfg, 4)
        qp = q.quantize_params(padded, mode="int8", tp=4)
        zio.save_pytree_npz(qp, out, meta={
            "mode": "int8", "tp": 4, "padded_heads": pcfg.padded_heads,
            "padded_vocab_size": pcfg.padded_vocab_size,
        })

        # Load the npz + meta the way cli.py does, then serve over a mesh.
        loaded, meta = zio.load_pytree_npz(out, with_meta=True)
        assert meta["padded_heads"] == 8
        cfg2 = dataclasses.replace(
            cfg, padded_heads=meta["padded_heads"],
            padded_vocab_size=meta["padded_vocab_size"],
        )
        mesh = pmesh.make_mesh(1, 4, devices=jax.devices()[:4])
        eng = InferenceEngine(cfg2, loaded, max_seq=24, prompt_buckets=(8,),
                              mesh=mesh)
        got = eng.generate([7, 1, 2], 6, SamplingConfig(temperature=0.0))
        # INT8 vs fp32 logits: greedy tokens may legitimately differ at a
        # near-tie, but on this tiny model they should match exactly.
        assert got == want

"""GPT-2 weight acquisition + conversion to the raw checkpoint format.

The TPU-native equivalent of the reference's download_weights.py (C17 in
SURVEY.md §2): fetch OpenAI's GPT-2 TF checkpoint and dump per-tensor
headerless raw f32 files under ``models/<size>/raw`` with the
``model-<tfvar with / -> ->`` naming scheme, ``*/w`` tensors transposed to
(out, in) — byte-compatible with what the reference's Zig loader reads
(main.zig:216, ops.zig:309-320). Also writes ``byte_encoder.json`` (the
byte→unicode table keyed unicode→byte, download_weights.py:68-90).

Three sources:
- ``--download``: OpenAI's public blob store (needs network; fixes the
  reference's literal-string bug at download_weights.py:36 where the URL
  was built without an f-prefix).
- ``--tf-ckpt``: convert an already-downloaded TF checkpoint.
- ``--hf``: convert a HuggingFace ``GPT2LMHeadModel`` name/path (torch,
  offline-friendly when cached) — HF's Conv1D stores (in, out); raw wants
  (out, in).

    python -m zig_gpt2_tpu.tools.download_weights --download 124M --out models/124M
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict

import numpy as np

from zig_gpt2_tpu.tokenizer.bpe import bytes_to_unicode
from zig_gpt2_tpu.utils.io import save_tensor

_OPENAI_FILES = (
    "checkpoint", "encoder.json", "hparams.json",
    "model.ckpt.data-00000-of-00001", "model.ckpt.index", "model.ckpt.meta",
    "vocab.bpe",
)
_OPENAI_URL = "https://openaipublic.blob.core.windows.net/gpt-2/models"


def write_byte_encoder(out_dir: Path) -> None:
    """byte_encoder.json, keyed unicode char -> byte value (C17 parity)."""
    table = {ch: b for b, ch in bytes_to_unicode().items()}
    (out_dir / "byte_encoder.json").write_text(
        json.dumps(table, ensure_ascii=False)
    )


def _save_raw(out_raw: Path, name: str, arr: np.ndarray, transpose: bool) -> None:
    arr = np.squeeze(np.asarray(arr, np.float32))
    if transpose:
        arr = arr.T  # (in, out) -> (out, in): the reference's column-major
    save_tensor(out_raw / f"model-{name.replace('/', '-')}", arr)


def convert_tf_checkpoint(ckpt_prefix: str | Path, out_dir: str | Path) -> int:
    """TF checkpoint -> raw files. Returns the number of tensors written."""
    import tensorflow as tf  # offline tool only — never in the runtime

    out_raw = Path(out_dir) / "raw"
    out_raw.mkdir(parents=True, exist_ok=True)
    reader = tf.train.load_checkpoint(str(ckpt_prefix))
    n = 0
    for var in reader.get_variable_to_shape_map():
        name = var.removeprefix("model/")
        _save_raw(out_raw, name, reader.get_tensor(var), transpose=name.endswith("/w"))
        n += 1
    return n


# HF GPT2LMHeadModel state-dict key -> (raw name template, is_weight_matrix).
_HF_MAP: Dict[str, str] = {
    "transformer.wte.weight": "wte",
    "transformer.wpe.weight": "wpe",
    "transformer.ln_f.weight": "ln_f/g",
    "transformer.ln_f.bias": "ln_f/b",
}
_HF_BLOCK_MAP: Dict[str, str] = {
    "ln_1.weight": "ln_1/g", "ln_1.bias": "ln_1/b",
    "attn.c_attn.weight": "attn/c_attn/w", "attn.c_attn.bias": "attn/c_attn/b",
    "attn.c_proj.weight": "attn/c_proj/w", "attn.c_proj.bias": "attn/c_proj/b",
    "ln_2.weight": "ln_2/g", "ln_2.bias": "ln_2/b",
    "mlp.c_fc.weight": "mlp/c_fc/w", "mlp.c_fc.bias": "mlp/c_fc/b",
    "mlp.c_proj.weight": "mlp/c_proj/w", "mlp.c_proj.bias": "mlp/c_proj/b",
}


def convert_hf_model(model, out_dir: str | Path) -> int:
    """transformers.GPT2LMHeadModel (or its state_dict) -> raw files.

    HF's Conv1D keeps weights (in, out) — same as the TF checkpoint — so
    ``*/w`` tensors get the same transpose to (out, in)."""
    out_raw = Path(out_dir) / "raw"
    out_raw.mkdir(parents=True, exist_ok=True)
    state = model if isinstance(model, dict) else model.state_dict()
    n = 0
    for key, tensor in state.items():
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        if key in _HF_MAP:
            name = _HF_MAP[key]
        elif key.startswith("transformer.h."):
            _, _, idx, rest = key.split(".", 3)
            sub = _HF_BLOCK_MAP.get(rest)
            if sub is None:
                continue  # attn.bias causal-mask buffers etc.
            name = f"h{idx}/{sub}"
        else:
            continue  # lm_head.weight is tied to wte (main.zig:312)
        _save_raw(out_raw, name, arr, transpose=name.endswith("/w"))
        n += 1
    return n


def download(size: str, out_dir: str | Path) -> None:
    """Fetch OpenAI's checkpoint files, then convert."""
    import requests  # needs network

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for filename in _OPENAI_FILES:
        dest = out / filename
        if dest.exists():
            continue
        url = f"{_OPENAI_URL}/{size}/{filename}"  # (reference bug: missing f)
        r = requests.get(url, stream=True, timeout=60)
        r.raise_for_status()
        with open(dest, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
    convert_tf_checkpoint(out / "model.ckpt", out)
    write_byte_encoder(out)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--download", metavar="SIZE", help="e.g. 124M / 355M / 774M / 1558M")
    src.add_argument("--tf-ckpt", metavar="PREFIX", help="local model.ckpt prefix")
    src.add_argument("--hf", metavar="NAME_OR_PATH", help="HF GPT2LMHeadModel")
    p.add_argument("--out", required=True, help="output model dir (raw/ created inside)")
    args = p.parse_args(argv)

    out = Path(args.out)
    if args.download:
        download(args.download, out)
        print(f"downloaded + converted {args.download} -> {out}/raw")
    elif args.tf_ckpt:
        n = convert_tf_checkpoint(args.tf_ckpt, out)
        write_byte_encoder(out)
        print(f"converted {n} tensors -> {out}/raw")
    else:
        from transformers import GPT2LMHeadModel

        model = GPT2LMHeadModel.from_pretrained(args.hf)
        n = convert_hf_model(model, out)
        write_byte_encoder(out)
        print(f"converted {n} tensors -> {out}/raw")


if __name__ == "__main__":
    main()

"""Weight / tensor IO.

Keeps the reference's headerless raw-binary tensor format for parity
(ops.zig:309-320: little-endian payload, shape & dtype supplied by the
caller; path scheme ``model-<tfvar with / -> ->`` from main.zig:216 and
download_weights.py:62) and adds:

- memory-mapped loading straight into ``jax.device_put`` with shardings,
- assembly of the stacked (scan-over-layers) parameter pytree,
- export back to the raw format, so golden-data tools and the original
  reference binary can consume weights produced here.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zig_gpt2_tpu.config import GPTConfig


def load_tensor(
    path: str | Path, shape: Sequence[int], dtype: np.dtype = np.float32
) -> np.ndarray:
    """Read a headerless raw tensor (reference: ops.zig:309-320). Uses mmap so
    500 MB+ checkpoints don't double-buffer on the host."""
    arr = np.memmap(path, dtype=dtype, mode="r")
    n = int(np.prod(shape))
    if arr.size != n:
        raise ValueError(f"{path}: expected {n} elements ({shape}), found {arr.size}")
    return np.asarray(arr).reshape(shape)


def save_tensor(path: str | Path, arr: np.ndarray) -> None:
    """Write the headerless raw format (same bytes ops.zig:309-320 reads)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.ascontiguousarray(arr).tofile(path)


def load_json(path: str | Path) -> Any:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# GPT-2 raw checkpoint <-> stacked param pytree
# ---------------------------------------------------------------------------
# Raw-file naming (mirrors the TF checkpoint variables, '/'->'-'; identical to
# the reference's scheme so checkpoints are interchangeable):
#   model-wte, model-wpe
#   model-h{i}-ln_1-{g,b}, model-h{i}-attn-c_attn-{w,b},
#   model-h{i}-attn-c_proj-{w,b}, model-h{i}-ln_2-{g,b},
#   model-h{i}-mlp-c_fc-{w,b}, model-h{i}-mlp-c_proj-{w,b}
#   model-ln_f-{g,b}
# NOTE on '-w' tensors: the reference's exporter transposes them to
# column-major (out, in) for cblas_sgemm (download_weights.py:57-64). We store
# and load the same (out, in) layout for interchangeability, then transpose
# back to (in, out) on import — (in, out) is the MXU-friendly x @ W layout.


def _linear_from_raw(d: Path, name: str, n_in: int, n_out: int, dtype) -> Dict[str, np.ndarray]:
    w = load_tensor(d / f"model-{name}-w", (n_out, n_in)).T  # -> (in, out)
    b = load_tensor(d / f"model-{name}-b", (n_out,))
    return {"w": np.ascontiguousarray(w, dtype=dtype), "b": b.astype(dtype)}


def _ln_from_raw(d: Path, name: str, n: int, dtype) -> Dict[str, np.ndarray]:
    return {
        "w": load_tensor(d / f"model-{name}-g", (n,)).astype(dtype),
        "b": load_tensor(d / f"model-{name}-b", (n,)).astype(dtype),
    }


def load_gpt2_raw(
    raw_dir: str | Path,
    config: GPTConfig,
    dtype: np.dtype = np.float32,
    device_put: bool = True,
    shardings: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Assemble the stacked parameter pytree from a raw-format checkpoint
    directory (reference loaders: main.zig:210-320). Weight tying is
    implicit — there is no lm_head file; the model uses wte (main.zig:312)."""
    d = Path(raw_dir)
    E, L = config.n_embed, config.n_layers

    def stack(fn):
        return np.stack([fn(i) for i in range(L)])

    def split_qkv(i):
        """The raw format packs QKV in one c_attn tensor (reference
        ops.zig:143); the model keeps separate head-shardable projections."""
        packed = _linear_from_raw(d, f"h{i}-attn-c_attn", E, 3 * E, dtype)
        w, b = packed["w"], packed["b"]  # (E, 3E), (3E,)
        return {
            name: {"w": np.ascontiguousarray(w[:, j * E : (j + 1) * E]),
                   "b": np.ascontiguousarray(b[j * E : (j + 1) * E])}
            for j, name in enumerate(("wq", "wk", "wv"))
        }

    qkv_split = [split_qkv(i) for i in range(L)]
    blocks = {
        "ln_1": _stack_tree([_ln_from_raw(d, f"h{i}-ln_1", E, dtype) for i in range(L)]),
        "attn": {
            "wq": _stack_tree([s["wq"] for s in qkv_split]),
            "wk": _stack_tree([s["wk"] for s in qkv_split]),
            "wv": _stack_tree([s["wv"] for s in qkv_split]),
            "c_proj": _stack_tree(
                [_linear_from_raw(d, f"h{i}-attn-c_proj", E, E, dtype) for i in range(L)]
            ),
        },
        "ln_2": _stack_tree([_ln_from_raw(d, f"h{i}-ln_2", E, dtype) for i in range(L)]),
        "mlp": {
            "c_fc": _stack_tree(
                [_linear_from_raw(d, f"h{i}-mlp-c_fc", E, 4 * E, dtype) for i in range(L)]
            ),
            "c_proj": _stack_tree(
                [_linear_from_raw(d, f"h{i}-mlp-c_proj", 4 * E, E, dtype) for i in range(L)]
            ),
        },
    }
    params = {
        "wte": load_tensor(d / "model-wte", (config.vocab_size, E)).astype(dtype),
        "wpe": load_tensor(d / "model-wpe", (config.context_size, E)).astype(dtype),
        "blocks": blocks,
        "ln_f": _ln_from_raw(d, "ln_f", E, dtype),
    }
    if device_put:
        if shardings is not None:
            params = jax.tree.map(
                lambda x, s: jax.device_put(jnp.asarray(x), s), params, shardings
            )
        else:
            params = jax.tree.map(jnp.asarray, params)
    return params


def save_gpt2_raw(params: Dict[str, Any], raw_dir: str | Path, config: GPTConfig) -> None:
    """Export the stacked pytree back to the raw format (inverse of
    load_gpt2_raw; '-w' tensors re-transposed to the reference's (out, in))."""
    d = Path(raw_dir)
    d.mkdir(parents=True, exist_ok=True)
    p = jax.tree.map(np.asarray, params)

    def save_linear(name, lp, i):
        save_tensor(d / f"model-{name}-w", np.ascontiguousarray(lp["w"][i].T))
        save_tensor(d / f"model-{name}-b", lp["b"][i])

    def save_ln(name, lp, i=None):
        w = lp["w"] if i is None else lp["w"][i]
        b = lp["b"] if i is None else lp["b"][i]
        save_tensor(d / f"model-{name}-g", w)
        save_tensor(d / f"model-{name}-b", b)

    save_tensor(d / "model-wte", p["wte"])
    save_tensor(d / "model-wpe", p["wpe"])
    for i in range(config.n_layers):
        save_ln(f"h{i}-ln_1", p["blocks"]["ln_1"], i)
        # Repack separate Q/K/V back into the reference's c_attn layout.
        a = p["blocks"]["attn"]
        packed = {
            "w": np.concatenate([a["wq"]["w"], a["wk"]["w"], a["wv"]["w"]], axis=-1),
            "b": np.concatenate([a["wq"]["b"], a["wk"]["b"], a["wv"]["b"]], axis=-1),
        }
        save_linear(f"h{i}-attn-c_attn", packed, i)
        save_linear(f"h{i}-attn-c_proj", p["blocks"]["attn"]["c_proj"], i)
        save_ln(f"h{i}-ln_2", p["blocks"]["ln_2"], i)
        save_linear(f"h{i}-mlp-c_fc", p["blocks"]["mlp"]["c_fc"], i)
        save_linear(f"h{i}-mlp-c_proj", p["blocks"]["mlp"]["c_proj"], i)
    save_ln("ln_f", p["ln_f"])


# ---------------------------------------------------------------------------
# Arbitrary-pytree checkpoints (quantized weights: int8/int4 payloads + scales)
# ---------------------------------------------------------------------------
# The raw format can't carry quantized params (headerless f32 only, and no
# place for scales), so repacked checkpoints use a single .npz whose keys are
# '/'-joined tree paths. This is the SURVEY.md §5 "quantized weight repacking
# (INT8/INT4 + scales) as an offline step".


_NPZ_META_KEY = "__zg2_meta__"


def save_pytree_npz(
    params: Dict[str, Any], path: str | Path, meta: Optional[dict] = None
) -> None:
    """``meta``: optional JSON-able dict stored alongside the tree — the
    repack tool records TP padding (padded_heads/padded_vocab_size/tp) so
    a pre-padded quantized checkpoint can reconstruct its config at load
    time (quantized layouts can't be padded post-hoc)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif node is not None:
            flat[prefix] = np.asarray(node)

    walk("", params)
    if meta:
        flat[_NPZ_META_KEY] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_pytree_npz(
    path: str | Path, device_put: bool = True, with_meta: bool = False
):
    meta: Optional[dict] = None
    with np.load(path) as z:
        params: Dict[str, Any] = {}
        for key in z.files:
            if key == _NPZ_META_KEY:
                meta = json.loads(bytes(z[key]).decode("utf-8"))
                continue
            node = params
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = z[key]
    if device_put:
        params = jax.tree.map(jnp.asarray, params)
    return (params, meta) if with_meta else params


def _stack_tree(trees: list) -> Dict[str, np.ndarray]:
    """Stack a list of identical dict-of-array trees along a new axis 0."""
    out = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        if isinstance(vals[0], dict):
            out[k] = _stack_tree(vals)
        else:
            out[k] = np.stack(vals)
    return out

"""Golden test-data generator.

The TPU-native equivalent of the reference's generate_test_data.py (C18):
forwards random tensors through PyTorch ops and dumps raw headerless
binaries to ``models/test/`` — the same files the reference's Zig test suite
consumes (tests.zig), so the two frameworks can be cross-validated on
identical goldens. Our own pytest suite prefers the in-process oracle
(zig_gpt2_tpu.tools.oracle); this tool exists for on-disk interchange.

    python -m zig_gpt2_tpu.tools.generate_test_data --out models/test
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="models/test")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import torch
    import torch.nn.functional as F

    from zig_gpt2_tpu.utils.io import save_tensor

    torch.manual_seed(args.seed)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    def dump(name: str, t: torch.Tensor) -> None:
        save_tensor(out / name, t.detach().numpy().astype(np.float32))

    B, T, E, H = 3, 5, 768, 12
    D = E // H

    # Linear, with and without bias (reference: linear_* / linear_no_bias_*).
    x = torch.randn(B, E)
    w = torch.randn(E, 4 * E)
    b = torch.randn(4 * E)
    dump("linear_inputs", x)
    dump("linear_weight", w.T.contiguous())  # (out, in): the raw layout
    dump("linear_bias", b)
    dump("linear_outputs", x @ w + b)
    dump("linear_no_bias_outputs", x @ w)

    # GELU (tanh approximation — the reference formula, ops.zig:224).
    g_in = torch.randn(B, 4 * E)
    dump("gelu_inputs", g_in)
    dump("gelu_outputs", F.gelu(g_in, approximate="tanh"))

    # Softmax.
    s_in = torch.randn(B, E)
    dump("softmax_inputs", s_in)
    dump("softmax_outputs", F.softmax(s_in, dim=-1))

    # Embedding.
    emb_w = torch.randn(100, E)
    idx = torch.randint(0, 100, (B,))
    dump("embedding_weight", emb_w)
    save_tensor(out / "embedding_inputs", idx.numpy().astype(np.float32))
    dump("embedding_outputs", emb_w[idx])

    # LayerNorm (eps 1e-5, affine — ops.zig:70-105).
    ln_in = torch.randn(B, E)
    ln_w, ln_b = torch.randn(E), torch.randn(E)
    dump("layer_norm_inputs", ln_in)
    dump("layer_norm_weight", ln_w)
    dump("layer_norm_bias", ln_b)
    dump("layer_norm_outputs", F.layer_norm(ln_in, (E,), ln_w, ln_b, eps=1e-5))

    # Masked SDPA intermediates (reference sdpa_*, generate_test_data.py:109).
    q = torch.randn(1, H, T, D)
    k = torch.randn(1, H, T, D)
    v = torch.randn(1, H, T, D)
    scores = q @ k.transpose(-2, -1) / math.sqrt(D)
    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
    probs = F.softmax(scores.masked_fill(~mask, float("-inf")), dim=-1)
    dump("sdpa_q", q)
    dump("sdpa_k", k)
    dump("sdpa_v", v)
    dump("sdpa_outputs", probs @ v)

    print(f"golden files written to {out}/")


if __name__ == "__main__":
    main()

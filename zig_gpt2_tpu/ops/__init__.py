"""Op library.

``zig_gpt2_tpu.ops.layers`` holds the pure-jnp reference implementations (the
numeric contract, mirroring the semantics of the reference's ops.zig);
``zig_gpt2_tpu.ops.pallas`` holds the fused TPU kernels that replace them on
the hot path. Every Pallas kernel is parity-tested against its jnp reference.
"""

from zig_gpt2_tpu.ops.layers import (
    embedding,
    gelu,
    layer_norm,
    linear,
    softmax,
    causal_attention,
    decode_attention,
)

__all__ = [
    "embedding",
    "gelu",
    "layer_norm",
    "linear",
    "softmax",
    "causal_attention",
    "decode_attention",
]

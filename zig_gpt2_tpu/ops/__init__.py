"""Op library.

``zig_gpt2_tpu.ops.layers`` holds the pure-jnp reference implementations (the
numeric contract, mirroring the semantics of the reference's ops.zig).
The fused TPU kernels that replace them on the hot path live in
``zig_gpt2_tpu.ops.attention`` (decode attention, fp + INT8-cache +
deferred-append variants), ``zig_gpt2_tpu.ops.sampling_kernel`` (Gumbel-max
categorical sampling on the native PRNG), and
``zig_gpt2_tpu.quant.kernels`` (fused dequant+matmul). Every Pallas kernel
is parity-tested against its jnp reference.
"""

from zig_gpt2_tpu.ops.layers import (
    causal_attention,
    decode_attention,
    decode_attention_quant,
    embedding,
    extend_attention,
    extend_attention_quant,
    gelu,
    layer_norm,
    linear,
    quantize_kv,
    softmax,
)

__all__ = [
    "causal_attention",
    "decode_attention",
    "decode_attention_quant",
    "embedding",
    "extend_attention",
    "extend_attention_quant",
    "gelu",
    "layer_norm",
    "linear",
    "quantize_kv",
    "softmax",
]

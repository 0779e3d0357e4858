"""Weight-only quantization (INT8 / INT4) and the INT8 KV cache.

The reference is FP32-only; quantization is a BASELINE.json-mandated
extension (PPL gates: Δ≤0.1 @INT8, Δ≤0.5 @INT4 vs FP32 on WikiText-2).
"""

from zig_gpt2_tpu.quant.quantize import (  # noqa: F401
    dequantize_linear,
    is_quantized,
    quantize_linear,
    quantize_params,
    quantized_linear,
)

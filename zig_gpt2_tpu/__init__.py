"""zig_gpt2_tpu — a TPU-native GPT-2 inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EugenHotaj/zig_gpt2 (reference: /root/reference — a single-threaded CPU Zig
inference engine): byte-level BPE, the full GPT-2 op set, KV-cached streaming
decode with zero-allocation steady state (donated device buffers), extended
with weight-only INT8/INT4 quantization, INT8 KV cache, tensor-parallel
sharding over TPU meshes, and continuous batching.
"""

from zig_gpt2_tpu.config import GPTConfig

__version__ = "0.1.0"

__all__ = ["GPTConfig", "__version__"]

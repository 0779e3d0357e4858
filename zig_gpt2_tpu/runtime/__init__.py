from zig_gpt2_tpu.runtime.engine import InferenceEngine, StreamDecoder
from zig_gpt2_tpu.runtime.sampling import sample

__all__ = ["InferenceEngine", "StreamDecoder", "sample"]

from zig_gpt2_tpu.utils import io

__all__ = ["io"]

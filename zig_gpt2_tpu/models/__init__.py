from zig_gpt2_tpu.models import gpt2

__all__ = ["gpt2"]

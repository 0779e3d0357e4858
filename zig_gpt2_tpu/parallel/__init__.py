from zig_gpt2_tpu.parallel import mesh, sharding

__all__ = ["mesh", "sharding"]

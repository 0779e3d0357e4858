from zig_gpt2_tpu.tokenizer.bpe import Encoder, bytes_to_unicode, train_bpe

__all__ = ["Encoder", "bytes_to_unicode", "train_bpe"]

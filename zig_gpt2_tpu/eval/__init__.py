"""Evaluation harnesses (WikiText-2 perplexity — the quantization PPL gate).

Import the functions from ``zig_gpt2_tpu.eval.perplexity`` (no re-exports
here: the module and its main function share the name ``perplexity``, and a
package-level re-export would shadow the submodule).
"""

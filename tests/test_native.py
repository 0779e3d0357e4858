"""Native (C++) BPE core parity tests.

The contract: the ctypes-driven C++ merge loop (native/bpe.cpp) produces
byte-identical output to the pure-Python Encoder on any input. Skipped when
no C++ toolchain is available (the tokenizer then runs pure Python).
"""

import numpy as np
import pytest

from zig_gpt2_tpu import native as zg2native
from zig_gpt2_tpu.tokenizer import bpe

pytestmark = pytest.mark.skipif(
    zg2native.load_bpe() is None, reason="native BPE library unavailable"
)


CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "Hello, world!  multiple  spaces\tand\nnewlines. "
    "numbers 12345 and punctuation?!... "
    "unicode: héllo wörld — naïve café 日本語 emoji 🎉🎊 "
    "contractions: don't we'll i'm you've she'd it's "
) * 3


@pytest.fixture(scope="module")
def encoders():
    vocab, merges = bpe.train_bpe(CORPUS, vocab_size=600)
    py = bpe.Encoder(vocab, merges, native=False)
    nat = bpe.Encoder(vocab, merges, native=True)
    assert nat._native is not None, "native encoder failed to initialize"
    return py, nat


def test_encode_parity(encoders):
    py, nat = encoders
    for text in [
        CORPUS,
        "edge;;;cases---with***rare^^^sequences",
        "a",
        " ",
        "   leading and trailing   ",
        "ünïcödé ☃ snowman",
        "",
    ]:
        assert nat.encode(text) == py.encode(text), repr(text)


def test_decode_parity_and_roundtrip(encoders, rng):
    py, nat = encoders
    ids = py.encode(CORPUS)
    assert nat.decode(ids) == py.decode(ids)
    assert nat.decode_bytes(ids) == py.decode_bytes(ids)
    assert nat.decode(ids) == CORPUS  # lossless roundtrip
    # Random id streams decode identically (arbitrary byte sequences).
    rand_ids = [int(i) for i in rng.integers(0, len(py.vocab), 200)]
    assert nat.decode_bytes(rand_ids) == py.decode_bytes(rand_ids)


def test_native_bpe_direct(encoders):
    """Drive the ctypes wrapper directly: word-level encode."""
    py, nat = encoders
    words = [b"the", b" quick", b" unknownishword", b"\xf0\x9f\x8e\x89"]
    got = nat._native.encode_words(words)
    want = []
    for w in words:
        mapped = "".join(py.byte_to_unicode[b] for b in w)
        want.extend(py.vocab[p] for p in py._bpe(mapped))
    assert got == want


def test_native_rejects_noncontiguous_vocab():
    vocab, merges = bpe.train_bpe("abcabc", vocab_size=260)
    gappy = {t: (i if i < 5 else i + 7) for t, i in vocab.items()}
    enc = bpe.Encoder(gappy, merges, native=True)
    assert enc._native is None  # falls back silently
    assert enc.encode("abc")  # still works via Python

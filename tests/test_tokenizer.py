"""Tokenizer tests: merge-rank BPE correctness, byte round-trips, the
reference's greedy mode, and (when available offline) tiktoken parity."""

import pytest

from zig_gpt2_tpu.tokenizer import Encoder, bytes_to_unicode, train_bpe


@pytest.fixture(scope="module")
def trained():
    text = (
        "the quick brown fox jumps over the lazy dog. "
        "hello world, hello tokenizer! numbers 12345 and unicode: héllo ünïcode "
        "they're we've can't it's     multiple   spaces\tand\nnewlines"
    ) * 3
    vocab, merges = train_bpe(text, vocab_size=400)
    return vocab, merges


def test_byte_table():
    b2u = bytes_to_unicode()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256
    assert b2u[ord("A")] == "A"
    assert b2u[ord(" ")] == "Ġ"  # space -> Ġ, the canonical GPT-2 mapping


def test_roundtrip(trained):
    vocab, merges = trained
    enc = Encoder(vocab, merges)
    for text in [
        "the quick brown fox",
        "hello   world",  # multi-space (the reference's known bug, bpe.zig:38)
        "héllo ünïcode",
        "tabs\tand\nnewlines",
        "they're we've can't",
        "unseen wørds çombine",
        "",
    ]:
        assert enc.decode(enc.encode(text)) == text


def test_merge_rank_order():
    """BPE must merge by rank, not greedily by length: with vocab containing
    'abc' but merges only producing ('a','b') then ('ab','c') in that order,
    check the path; and if a lower-rank merge exists it wins first."""
    b2u = bytes_to_unicode()
    a, b, c = b2u[ord("a")], b2u[ord("b")], b2u[ord("c")]
    # merges: (b,c) has better rank than (a,b) -> "abc" becomes [a, bc]
    vocab = {a: 0, b: 1, c: 2, b + c: 3, a + b: 4, a + b + c: 5}
    enc = Encoder(vocab, merges=[(b, c), (a, b)])
    assert enc.encode("abc") == [0, 3]
    # greedy longest-prefix (the reference's algorithm) would take "abc" whole
    greedy = Encoder(vocab, mode="greedy")
    assert greedy.encode("abc") == [5]


def test_greedy_mode_roundtrip(trained):
    vocab, merges = trained
    enc = Encoder(vocab, mode="greedy")
    text = "the quick brown fox"
    assert enc.decode(enc.encode(text)) == text


def test_decode_bytes_partial_utf8(trained):
    vocab, merges = trained
    enc = Encoder(vocab, merges)
    ids = enc.encode("héllo")
    data = enc.decode_bytes(ids)
    assert data.decode("utf-8") == "héllo"


def test_tiktoken_parity_if_available():
    """Full GPT-2 parity against tiktoken (the oracle generate_nano_gpt.py:215
    uses). Skipped when the tiktoken BPE files aren't cached offline."""
    tiktoken = pytest.importorskip("tiktoken")
    try:
        tk = tiktoken.get_encoding("gpt2")
    except Exception:
        pytest.skip("tiktoken gpt2 files not available offline")
    # Rebuild our encoder from tiktoken's mergeable ranks.
    b2u = bytes_to_unicode()
    vocab = {}
    for token_bytes, rank in tk._mergeable_ranks.items():
        vocab["".join(b2u[b] for b in token_bytes)] = rank
    # Derive merges: every multi-char token splits into its two highest-rank halves.
    ranks = tk._mergeable_ranks
    merges = []
    for token, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
        if len(token) < 2:
            continue
        best = None
        for i in range(1, len(token)):
            l, r = token[:i], token[i:]
            if l in ranks and r in ranks and ranks[l] < rank and ranks[r] < rank:
                cand = max(ranks[l], ranks[r])
                if best is None or cand < best[0]:
                    best = (cand, l, r)
        assert best is not None
        merges.append((
            "".join(b2u[b] for b in best[1]),
            "".join(b2u[b] for b in best[2]),
        ))
    enc = Encoder(vocab, merges)
    for text in ["Hello, world!", "The 2024 Olympics were great.", "  indented\ncode():"]:
        assert enc.encode(text) == tk.encode(text)

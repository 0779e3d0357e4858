"""Byte-level BPE tokenizer (GPT-2).

A from-scratch implementation of the tokenizer the reference approximates in
bpe.zig. Two deliberate upgrades over the reference (SURVEY.md §3.4):

1. **True merge-rank BPE.** The reference does greedy longest-prefix vocab
   matching and never uses the downloaded ``vocab.bpe`` merges (bpe.zig:83-92)
   — valid but divergent from GPT-2/tiktoken on rare words. Here ``encode``
   applies merges in rank order, matching tiktoken exactly. The reference's
   greedy algorithm is kept as ``mode="greedy"`` for behavioral parity tests.
2. **Exact pre-tokenizer.** The reference compiles a POSIX ERE approximation
   with a known multi-space bug (bpe.zig:34-40). Here the exact OpenAI GPT-2
   pattern runs via the ``regex`` module (host-side work — tokenization never
   touches the device).

Tokenization is host-side; a C++ fast path with identical semantics lives in
``zig_gpt2_tpu/native`` (the analogue of the reference's Zig+regex.h native
substrate) and is used automatically when built.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import regex as re

# OpenAI's exact GPT-2 pre-tokenization pattern (contractions, letter runs,
# number runs, other runs, trailing-space handling, whitespace runs).
PRETOKENIZE_PATTERN = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """The GPT-2 byte <-> printable-unicode table.

    Generated locally (same table download_weights.py:68-90 dumps as
    byte_encoder.json): printable latin-1 bytes map to themselves, the rest
    map to 256+offset codepoints.
    """
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: Tuple[str, ...]) -> set:
    return {(a, b) for a, b in zip(word, word[1:])}


class Encoder:
    """Byte-level BPE encoder/decoder.

    Reference interface parity: Encoder.init/encode/decode (bpe.zig:14,59,99),
    re-designed: ids are returned as a list (no caller-sized scratch), encode
    is merge-rank BPE, and decode round-trips arbitrary bytes.
    """

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: Optional[Sequence[Tuple[str, str]]] = None,
        mode: str = "bpe",
        native: bool = True,
    ):
        """Args:
          vocab: token string (in byte-unicode space) -> id (encoder.json).
          merges: ordered merge pairs (vocab.bpe). Required for mode="bpe".
          mode: "bpe" (true merge-rank) or "greedy" (the reference's
            longest-prefix algorithm, bpe.zig:81-92, for parity testing).
          native: use the C++ merge-loop core when available (identical
            output; pure-Python fallback otherwise).
        """
        if mode not in ("bpe", "greedy"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "bpe" and merges is None:
            raise ValueError("mode='bpe' requires merges (vocab.bpe)")
        self.vocab = dict(vocab)
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.merge_ranks: Dict[Tuple[str, str], int] = (
            {tuple(m): i for i, m in enumerate(merges)} if merges else {}
        )
        self.mode = mode
        self.byte_to_unicode = bytes_to_unicode()
        self.unicode_to_byte = {v: k for k, v in self.byte_to_unicode.items()}
        self._bpe_cache: Dict[str, Tuple[str, ...]] = {}
        self._native = None
        self._native_ids: Dict[str, List[int]] = {}
        if native and mode == "bpe":
            self._native = self._init_native()

    def _to_bytes(self, token: str) -> Optional[bytes]:
        """Unicode-space token -> raw bytes (None if any char is unmapped)."""
        try:
            return bytes(self.unicode_to_byte[ch] for ch in token)
        except KeyError:
            return None

    def _init_native(self):
        """Build the C++ encoder (zig_gpt2_tpu.native) when possible."""
        if sorted(self.vocab.values()) != list(range(len(self.vocab))):
            return None  # native core indexes tokens by contiguous id
        by_id = sorted(self.vocab, key=self.vocab.get)
        vocab_bytes = [self._to_bytes(t) for t in by_id]
        merge_bytes = [
            (self._to_bytes(l), self._to_bytes(r))
            for (l, r) in sorted(self.merge_ranks, key=self.merge_ranks.get)
        ]
        if any(t is None for t in vocab_bytes) or any(
            l is None or r is None for l, r in merge_bytes
        ):
            return None
        try:
            from zig_gpt2_tpu.native import NativeBPE

            return NativeBPE(vocab_bytes, merge_bytes)
        except Exception:
            return None

    # -- construction -------------------------------------------------------

    @classmethod
    def from_files(
        cls,
        encoder_json: str | Path,
        vocab_bpe: Optional[str | Path] = None,
        mode: str = "bpe",
    ) -> "Encoder":
        """Load from OpenAI-format files (encoder.json + vocab.bpe)."""
        with open(encoder_json, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = None
        if vocab_bpe is not None:
            lines = Path(vocab_bpe).read_text(encoding="utf-8").split("\n")
            # First line is the "#version" header; blank lines at EOF.
            merges = [tuple(l.split()) for l in lines if l and not l.startswith("#")]
        return cls(vocab, merges, mode=mode)

    # -- BPE core ------------------------------------------------------------

    def _bpe(self, token: str) -> Tuple[str, ...]:
        """Apply merges in rank order to one pre-token (byte-unicode string)."""
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token)
        while len(word) > 1:
            pairs = _get_pairs(word)
            best = min(pairs, key=lambda p: self.merge_ranks.get(p, 1 << 60))
            if best not in self.merge_ranks:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        self._bpe_cache[token] = word
        return word

    def _greedy(self, token: str) -> List[str]:
        """The reference's greedy longest-prefix match (bpe.zig:81-92)."""
        pieces = []
        start = 0
        while start < len(token):
            end = len(token)
            while end > start and token[start:end] not in self.vocab:
                end -= 1
            if end == start:  # unknown single char — should not happen with
                end = start + 1  # a complete byte-level vocab
            pieces.append(token[start:end])
            start = end
        return pieces

    # -- public API ----------------------------------------------------------

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for pre in PRETOKENIZE_PATTERN.findall(text):
            raw = pre.encode("utf-8")
            if self._native is not None:
                cached = self._native_ids.get(pre)
                if cached is None:
                    cached = self._native.encode_words([raw])
                    if cached is None:  # unknown piece — Python fallback
                        mapped = "".join(self.byte_to_unicode[b] for b in raw)
                        cached = [self.vocab[p] for p in self._bpe(mapped)]
                    self._native_ids[pre] = cached
                ids.extend(cached)
                continue
            mapped = "".join(self.byte_to_unicode[b] for b in raw)
            pieces = self._bpe(mapped) if self.mode == "bpe" else self._greedy(mapped)
            ids.extend(self.vocab[p] for p in pieces)
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        """Lossless byte decode (streaming decoders must buffer partial
        UTF-8 sequences; see runtime.engine.StreamDecoder)."""
        ids = list(ids)
        if self._native is not None:
            out = self._native.decode(ids)
            if out is not None:
                return out
        text = "".join(self.inv_vocab[i] for i in ids)
        return bytes(self.unicode_to_byte[ch] for ch in text)

    def __len__(self) -> int:
        return len(self.vocab)


def train_bpe(text: str, vocab_size: int) -> Tuple[Dict[str, int], List[Tuple[str, str]]]:
    """Train a byte-level BPE vocab on ``text`` (pair-frequency greedy merge,
    the standard algorithm). Used to build self-contained test vocabs and tiny
    demo models without network access; not a production trainer."""
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(b2u.values()))}
    if vocab_size < len(vocab):
        raise ValueError(f"vocab_size must be >= {len(vocab)} (byte alphabet)")
    words: Dict[Tuple[str, ...], int] = {}
    for pre in PRETOKENIZE_PATTERN.findall(text):
        mapped = tuple(b2u[b] for b in pre.encode("utf-8"))
        words[mapped] = words.get(mapped, 0) + 1
    merges: List[Tuple[str, str]] = []
    while len(vocab) < vocab_size:
        counts: Dict[Tuple[str, str], int] = {}
        for word, freq in words.items():
            for pair in zip(word, word[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], p))
        a, b = best
        merges.append(best)
        vocab[a + b] = len(vocab)
        new_words: Dict[Tuple[str, ...], int] = {}
        for word, freq in words.items():
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            key = tuple(merged)
            new_words[key] = new_words.get(key, 0) + freq
        words = new_words
    return vocab, merges

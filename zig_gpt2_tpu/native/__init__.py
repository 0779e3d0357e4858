"""Host-native runtime layer (C++ via ctypes).

The reference's native substrate is Zig + C (BLAS sgemm for compute, POSIX
regex for tokenization — SURVEY.md §2.2). In this framework the *compute*
native layer is Pallas/XLA on the TPU; the *host* native layer lives here:
C++ shared libraries with a C ABI, loaded through ctypes (the environment
ships no pybind11 — see native/Makefile).

Currently: ``libzg2bpe.so`` — the BPE merge-rank encode/decode core
(native/bpe.cpp). Loading is lazy and optional: if the library is missing,
``load_bpe()`` tries one ``make`` build when a toolchain exists, then the
tokenizer silently uses its pure-Python implementation (exact same output,
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_DIR = Path(__file__).parent / "lib"
_SRC_DIR = Path(__file__).resolve().parents[2] / "native"
_lib = None
_lib_failed = False


def _try_build() -> bool:
    makefile = _SRC_DIR / "Makefile"
    if not makefile.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_SRC_DIR), f"OUTDIR={_LIB_DIR}"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load_bpe() -> Optional[ctypes.CDLL]:
    """Load (building on first use if possible) the native BPE library.
    Returns None when unavailable — callers must fall back to Python."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    so = _LIB_DIR / "libzg2bpe.so"
    if not so.exists() and not _try_build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        _lib_failed = True
        return None
    lib.zg2_bpe_create.restype = ctypes.c_void_p
    lib.zg2_bpe_create.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.zg2_bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.zg2_bpe_encode_words.restype = ctypes.c_int64
    lib.zg2_bpe_encode_words.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.zg2_bpe_decode.restype = ctypes.c_int64
    lib.zg2_bpe_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def _pack(strings: Sequence[bytes]) -> Tuple[bytes, np.ndarray]:
    blob = b"".join(strings)
    offsets = np.cumsum([len(s) for s in strings]).astype(np.int64)
    return blob, offsets


class NativeBPE:
    """ctypes handle around the C++ merge-rank BPE core.

    Operates entirely in BYTE space: the caller converts the GPT-2
    unicode-space vocab/merges through the byte<->unicode table first.
    """

    def __init__(self, vocab: Sequence[bytes], merges: Sequence[Tuple[bytes, bytes]]):
        lib = load_bpe()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        tok_blob, tok_off = _pack(list(vocab))
        mrg_flat: List[bytes] = []
        for l, r in merges:
            mrg_flat.extend((l, r))
        mrg_blob, mrg_off = _pack(mrg_flat)
        self._handle = lib.zg2_bpe_create(
            tok_blob, tok_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(vocab),
            mrg_blob, mrg_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(merges),
        )
        if not self._handle:
            raise RuntimeError("zg2_bpe_create failed")
        # keep offset arrays alive until after create returns
        del tok_off, mrg_off

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.zg2_bpe_destroy(handle)
            self._handle = None

    def encode_words(self, words: Sequence[bytes]) -> Optional[List[int]]:
        """BPE-encode pre-tokenized byte words. None => unknown piece
        (caller falls back to Python)."""
        if not words:
            return []
        blob, offsets = _pack(list(words))
        out = np.empty(len(blob), np.int32)
        n = self._lib.zg2_bpe_encode_words(
            self._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(words),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if n < 0:
            return None
        return out[:n].tolist()

    def decode(self, ids: Sequence[int]) -> Optional[bytes]:
        arr = np.asarray(list(ids), np.int32)
        cap = 16 + 64 * max(len(arr), 1)
        for _ in range(4):
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.zg2_bpe_decode(
                self._handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr), buf, cap,
            )
            if n >= 0:
                return buf.raw[:n]
            cap *= 8
        return None

"""ctypes bindings for the native WordPiece tokenizer (csrc/wordpiece.cpp).

Builds the shared library on first use with g++ (cached under
``~/.cache/bpx``); every call degrades gracefully to the pure-Python
tokenizer when the toolchain or library is unavailable, and for non-ASCII
text (the C fast path covers ASCII only — the dominant case for the English
benchmark corpora).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "wordpiece.cpp")


def _build_lib() -> Optional[str]:
    """Compile the extension (cached by source hash); None on failure."""
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(os.path.expanduser("~"), ".cache", "bpx")
        os.makedirs(cache, exist_ok=True)
        lib_path = os.path.join(cache, f"libwordpiece-{digest}.so")
        if not os.path.exists(lib_path):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", lib_path],
                check=True, capture_output=True)
        return lib_path
    except Exception:
        return None


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        path = _build_lib()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.wp_load_vocab.restype = ctypes.c_void_p
        lib.wp_load_vocab.argtypes = [ctypes.c_char_p]
        lib.wp_free_vocab.argtypes = [ctypes.c_void_p]
        lib.wp_vocab_size.restype = ctypes.c_int32
        lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
        lib.wp_encode.restype = ctypes.c_int32
        lib.wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib if _lib is not False else None


class NativeWordPieceTokenizer:
    """Drop-in fast path for :class:`bpx.data.tokenization.WordPieceTokenizer`.

    ``encode`` uses the C library for ASCII text and delegates to the given
    Python tokenizer otherwise (or when the library failed to build).
    """

    def __init__(self, vocab_path: str, fallback):
        self.fallback = fallback
        self._handle = None
        lib = _get_lib()
        if lib is not None:
            handle = lib.wp_load_vocab(vocab_path.encode())
            if handle:
                self._handle = ctypes.c_void_p(handle)
                self._lib = lib

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def encode(self, text: str, max_len: int) -> List[int]:
        if self._handle is not None:
            try:
                raw = text.encode("ascii")
            except UnicodeEncodeError:
                return self.fallback.encode(text, max_len)
            out = (ctypes.c_int32 * max_len)()
            n = self._lib.wp_encode(self._handle, raw, max_len, out)
            if n >= 0:
                return list(out[:n])
        return self.fallback.encode(text, max_len)

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            try:
                self._lib.wp_free_vocab(self._handle)
            except Exception:
                pass

"""Native (C++) host-side helpers, loaded via ctypes.

Builds ``speech_native.cpp`` with g++ on first use (cached as a .so next to
the source); every entry point has a pure-python fallback in its caller, so
the package works without a compiler too.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "src" / "speech_native.cpp"
_SO = _DIR / "speech_native.so"

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    i64 = ctypes.c_int64
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.levenshtein.restype = i64
    lib.levenshtein.argtypes = [p64, i64, p64, i64]
    lib.batch_by_size.restype = i64
    lib.batch_by_size.argtypes = [p64, i64, i64, i64, i64, p64]
    lib.bleu_counts.restype = None
    lib.bleu_counts.argtypes = [p64, i64, p64, i64, p64, p64]
    pf32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.read_wav_batch.restype = i64
    lib.read_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), i64, pf32, i64, p64, p64, i64]
    _lib = lib
    return lib


def _encode_pair(a: List[str], b: List[str]):
    table = {}
    def enc(seq):
        out = np.empty(len(seq), np.int64)
        for i, tok in enumerate(seq):
            out[i] = table.setdefault(tok, len(table))
        return out
    return enc(a), enc(b)


def levenshtein(a: List[str], b: List[str]) -> int:
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    ea, eb = _encode_pair(a, b)
    return int(lib.levenshtein(ea, len(ea), eb, len(eb)))


def batch_offsets(sizes: np.ndarray, max_tokens: int,
                  max_sentences: int = 0, bsz_mult: int = 1) -> np.ndarray:
    """Batch end-offsets over iteration-ordered sizes (C fast path)."""
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    sizes = np.ascontiguousarray(sizes, np.int64)
    out = np.empty(len(sizes) + 1, np.int64)
    nb = lib.batch_by_size(sizes, len(sizes), max_tokens, max_sentences,
                           bsz_mult, out)
    return out[:nb]


def bleu_counts(hyp: List[str], ref: List[str]):
    lib = _load()
    if lib is None:
        raise ImportError("native library unavailable")
    eh, er = _encode_pair(hyp, ref)
    matches = np.zeros(4, np.int64)
    totals = np.zeros(4, np.int64)
    lib.bleu_counts(eh, len(eh), er, len(er), matches, totals)
    return matches, totals


def available() -> bool:
    return _load() is not None


def read_wav_batch(paths: List[str], stride: int, threads: int = 8):
    """Decode a batch of PCM16 WAV files in parallel (C++ thread pool)
    into a fresh [n, stride] float32 buffer.

    Returns (out, lens, rates) with lens[i] = -1 for files the native
    reader cannot handle (caller falls back per-file), or None when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, stride), np.float32)
    lens = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.read_wav_batch(arr, n, out, stride, lens, rates, threads)
    return out, lens, rates

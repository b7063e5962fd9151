"""ctypes bindings for the native host runtime (auto-building, optional).

Falls back to the pure numpy/Python implementations when the shared
library is unavailable (e.g. no compiler); all callers treat this module
as an accelerator, never a semantic change — the native code implements
exactly the same reference semantics and is cross-checked by tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libwordpiece_host.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _LIB = None
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _LIB = None
            return None

        lib.wp_decode_utf8.restype = ctypes.c_int64
        lib.wp_decode_utf8.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.wp_char_classes.restype = None
        lib.wp_char_classes.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.wp_encode_scalar.restype = ctypes.c_int64
        lib.wp_encode_scalar.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.wp_split_whitespace.restype = None
        lib.wp_split_whitespace.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def decode_utf8(data: bytes) -> np.ndarray | None:
    """Native UTF-8 decode; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(len(data), dtype=np.uint32)
    n = lib.wp_decode_utf8(
        buf.ctypes.data_as(ctypes.c_void_p), len(data), out.ctypes.data_as(ctypes.c_void_p)
    )
    return out[:n].copy()


def char_classes(cp: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    cp = np.ascontiguousarray(cp, dtype=np.uint32)
    out = np.empty(cp.shape[0], dtype=np.uint8)
    lib.wp_char_classes(
        cp.ctypes.data_as(ctypes.c_void_p), cp.shape[0], out.ctypes.data_as(ctypes.c_void_p)
    )
    return out


def pack_vocab(vocab) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vocabulary -> (words_flat u32, offsets i64[v+1], flags u8[v])."""
    flat = np.ascontiguousarray(vocab.flat, dtype=np.uint32)
    offsets = np.ascontiguousarray(vocab.offsets, dtype=np.int64)
    flags = (
        vocab.is_prefix.astype(np.uint8)
        | ((vocab.is_special | vocab.is_malformed).astype(np.uint8) << 1)
    )
    return flat, offsets, flags


def encode_scalar(text_cp: np.ndarray, vocab) -> np.ndarray | None:
    """Native golden encoder; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    flat, offsets, flags = pack_vocab(vocab)
    cp = np.ascontiguousarray(text_cp, dtype=np.uint32)
    out = np.empty(cp.shape[0] + 1, dtype=np.int32)
    n = lib.wp_encode_scalar(
        cp.ctypes.data_as(ctypes.c_void_p),
        cp.shape[0],
        flat.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        flags.ctypes.data_as(ctypes.c_void_p),
        vocab.size,
        np.int32(vocab.unk_token_id),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:n].copy()


def split_whitespace(cp: np.ndarray, n_shards: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    cp = np.ascontiguousarray(cp, dtype=np.uint32)
    ends = np.empty(n_shards, dtype=np.int64)
    lib.wp_split_whitespace(
        cp.ctypes.data_as(ctypes.c_void_p),
        cp.shape[0],
        n_shards,
        ends.ctypes.data_as(ctypes.c_void_p),
    )
    return ends

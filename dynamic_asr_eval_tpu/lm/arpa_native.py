"""ctypes binding for the native ARPA reader (``native/arpa_reader.cc``).

The reference's KenLM path is a C++ ARPA loader under pyctcdecode
(``wav2vec2/tedlium/run.py:127-133``); this module is its TPU-build
counterpart.  The shared library is built on demand with ``g++ -shared``
(no pybind11 in the image — plain C ABI + ctypes), cached under
``native/build/``, and falls back cleanly: callers use
:func:`parse_arpa` when :func:`available` is true, else the pure-Python
parser in ``lm/ngram.py``.

Returned layout mirrors the Python parser: an interned vocabulary (token
strings, id = first-appearance order, which for well-formed ARPA means
unigram order) and, per n-gram order ``k``, ``(ids [n, k] int32,
logp10 [n] f32, backoff10 [n] f32)`` — log10 values as stored in the file.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from dynamic_asr_eval_tpu import nativelib

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        lib = nativelib.load("arpa_reader.cc", libs=("z",))
        if lib is None:
            _load_failed = True
            return None
        lib.arpa_parse.restype = ctypes.c_void_p
        lib.arpa_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.arpa_error.restype = ctypes.c_char_p
        lib.arpa_error.argtypes = [ctypes.c_void_p]
        lib.arpa_order.restype = ctypes.c_int
        lib.arpa_order.argtypes = [ctypes.c_void_p]
        lib.arpa_num_rows.restype = ctypes.c_int64
        lib.arpa_num_rows.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.arpa_vocab_size.restype = ctypes.c_int64
        lib.arpa_vocab_size.argtypes = [ctypes.c_void_p]
        lib.arpa_vocab_bytes.restype = ctypes.c_int64
        lib.arpa_vocab_bytes.argtypes = [ctypes.c_void_p]
        lib.arpa_copy_vocab.restype = None
        lib.arpa_copy_vocab.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.arpa_copy_rows.restype = None
        lib.arpa_copy_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.arpa_free.restype = None
        lib.arpa_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native reader is importable (building it if needed).
    Set ``DAE_NO_NATIVE_ARPA=1`` to force the pure-Python parser."""
    if os.environ.get("DAE_NO_NATIVE_ARPA"):
        return False
    return _load() is not None


def parse_arpa(
    path: str, max_order: Optional[int] = None
) -> Tuple[List[str], Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Parse an ARPA file (plain or .gz) natively.

    Returns ``(vocab, tables)`` with ``tables[k] = (ids [n,k] int32,
    logp10 [n] f32, backoff10 [n] f32)``.  Raises on unreadable files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ARPA reader unavailable")
    h = lib.arpa_parse(path.encode(), int(max_order or 0))
    if not h:
        raise RuntimeError("arpa_parse returned NULL")
    try:
        err = lib.arpa_error(h)
        if err:
            raise FileNotFoundError(f"{path}: {err.decode()}")
        nv = lib.arpa_vocab_size(h)
        nb = lib.arpa_vocab_bytes(h)
        buf = ctypes.create_string_buffer(int(nb) + 1)
        if nv:
            lib.arpa_copy_vocab(h, buf)
        vocab = buf.raw[: int(nb)].decode("utf-8", errors="replace").split("\n") if nv else []
        tables = {}
        for k in range(1, lib.arpa_order(h) + 1):
            n = int(lib.arpa_num_rows(h, k))
            if n == 0:
                continue
            ids = np.empty((n, k), np.int32)
            lp = np.empty((n,), np.float32)
            bo = np.empty((n,), np.float32)
            lib.arpa_copy_rows(
                h, k,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                bo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            tables[k] = (ids, lp, bo)
        return vocab, tables
    finally:
        lib.arpa_free(h)


def hash_rows(ids: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit LCG hash of id rows ``[n, k]`` — numerically
    identical to ``lm.ngram._hash_ctx`` (h = h*MUL + id + 1 per column)."""
    from dynamic_asr_eval_tpu.lm.ngram import _INC, _MUL

    with np.errstate(over="ignore"):
        h = np.full((ids.shape[0],), _INC, np.uint64)
        for j in range(ids.shape[1]):
            h = h * _MUL + (ids[:, j].astype(np.uint64) + np.uint64(1))
    return h

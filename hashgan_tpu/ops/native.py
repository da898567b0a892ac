"""ctypes bindings to the native host scanner (native/hamming_ref.cpp).

Builds the shared library on first use (g++ -O3; ~1s) and caches it next to
the source. Falls back gracefully: ``available()`` is False when no
compiler exists, and callers (tests, verification tools) skip to the numpy
oracle. The C++ engine implements the exact same (distance, index) total
order as every other engine — it exists so TPU results can be verified at
scales where the python-loop numpy oracle is too slow, and as the CPU
scanner for mmap-backed galleries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "hamming_ref.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "libhamming_ref.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return False
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", lib, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(os.path.abspath(_LIB))
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.hamming_distance.argtypes = [u32p, u32p, i64, i64, i64, i32p]
    lib.hamming_topk.argtypes = [u32p, u32p, i64, i64, i64, i64, i32p, i32p]
    lib.pack_codes.argtypes = [f32p, i64, i64, u32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def hamming_distance_native(
    packed_q: np.ndarray, packed_g: np.ndarray
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native scanner unavailable"
    q, w = packed_q.shape
    n = packed_g.shape[0]
    out = np.empty((q, n), dtype=np.int32)
    lib.hamming_distance(
        np.ascontiguousarray(packed_q), np.ascontiguousarray(packed_g),
        q, n, w, out,
    )
    return out


def hamming_topk_native(
    packed_q: np.ndarray, packed_g: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None, "native scanner unavailable"
    q, w = packed_q.shape
    n = packed_g.shape[0]
    out_d = np.empty((q, k), dtype=np.int32)
    out_i = np.empty((q, k), dtype=np.int32)
    lib.hamming_topk(
        np.ascontiguousarray(packed_q), np.ascontiguousarray(packed_g),
        q, n, w, k, out_d, out_i,
    )
    return out_d, out_i


def pack_codes_native(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native scanner unavailable"
    n, b = codes.shape
    words = (b + 31) // 32
    out = np.zeros((n, words), dtype=np.uint32)
    lib.pack_codes(np.ascontiguousarray(codes, dtype=np.float32), n, b, out)
    return out

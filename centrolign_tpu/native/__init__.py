"""Native (C++) host runtime: compiled on demand with g++, loaded via ctypes.

Holds the serial-sweep algorithms that are host-latency-bound rather than
TPU-shaped: the sparse chaining DP (chain.cpp). The shared object is built
into this directory and rebuilt whenever a source file changes (hash check).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["chain.cpp"]
_SO = os.path.join(_DIR, "_native.so")
_HASH = os.path.join(_DIR, "_native.hash")

_lib = None


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _SO]
    cmd += [os.path.join(_DIR, s) for s in _SOURCES]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_HASH, "w") as f:
        f.write(_source_hash())


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    want = _source_hash()
    have = None
    if os.path.exists(_HASH) and os.path.exists(_SO):
        with open(_HASH) as f:
            have = f.read().strip()
    if have != want:
        _build()
    lib = ctypes.CDLL(_SO)
    lib.chain_dp_seq.restype = ctypes.c_int64
    lib.chain_dp_seq.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def _ptr_i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_f64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def chain_dp_seq(s1, e1, s2, e2, w, init_w, fin_w, use_gap: bool,
                 go, ge, scale: float, min_score: float):
    """Run the native chaining DP. Returns (best_end_index or -1, backptr,
    dp_final)."""
    lib = get_lib()
    n = len(s1)
    s1 = np.ascontiguousarray(s1, dtype=np.int64)
    e1 = np.ascontiguousarray(e1, dtype=np.int64)
    s2 = np.ascontiguousarray(s2, dtype=np.int64)
    e2 = np.ascontiguousarray(e2, dtype=np.int64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    init_w = np.ascontiguousarray(init_w, dtype=np.float64)
    fin_w = np.ascontiguousarray(fin_w, dtype=np.float64)
    go = np.ascontiguousarray(go, dtype=np.float64)
    ge = np.ascontiguousarray(ge, dtype=np.float64)
    backptr = np.empty(n, dtype=np.int64)
    dp = np.empty(n, dtype=np.float64)
    best = lib.chain_dp_seq(
        n, _ptr_i64(s1), _ptr_i64(e1), _ptr_i64(s2), _ptr_i64(e2),
        _ptr_f64(w), _ptr_f64(init_w), _ptr_f64(fin_w),
        1 if use_gap else 0, len(go), _ptr_f64(go), _ptr_f64(ge),
        float(scale), float(min_score), _ptr_i64(backptr), _ptr_f64(dp))
    return int(best), backptr, dp

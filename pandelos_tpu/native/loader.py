"""Build + load the native host-index core via ctypes.

The shared library is compiled on first use with g++ (no pybind11 in this
environment; plain C ABI + ctypes).  Set ``PANDELOS_NATIVE=0`` to force the
pure-NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_index.cpp")
_SO = os.path.join(_HERE, "build", "libpandelos_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_so() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        _SRC,
        "-o",
        _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("PANDELOS_NATIVE", "1") == "0":
            _load_failed = True
            return None
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(
                _SO
            ) < os.path.getmtime(_SRC):
                _build_so()
            lib = ctypes.CDLL(_SO)
        except Exception:
            _load_failed = True
            return None
        lib.pt_build_index.restype = ctypes.c_int
        lib.pt_build_index.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pt_free.restype = None
        lib.pt_free.argtypes = [ctypes.c_void_p]
        lib.pt_gn_split.restype = ctypes.c_int
        lib.pt_gn_split.argtypes = [
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_gn_split(
    n: int, eu: np.ndarray, ev: np.ndarray
) -> Optional[np.ndarray]:
    """One Girvan-Newman split level over a graph of `n` nodes (local ids
    0..n-1 in first-appearance order) and edges (eu[i], ev[i]) in
    insertion order.  Returns int32 component labels, or None when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    eu = np.ascontiguousarray(eu, dtype=np.int32)
    ev = np.ascontiguousarray(ev, dtype=np.int32)
    labels = np.empty(n, dtype=np.int32)
    rc = lib.pt_gn_split(
        ctypes.c_int32(n),
        ctypes.c_int64(len(eu)),
        eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return labels


def native_build_index(concat: np.ndarray, offsets: np.ndarray, k: int):
    """Returns (profile_ptr, profile_ids, profile_counts, costs,
    vocab_size, total_vocab) or None when unavailable / key overflow."""
    lib = _load()
    if lib is None:
        return None
    concat = np.ascontiguousarray(concat, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_seq = offsets.shape[0] - 1

    p_ptr = ctypes.POINTER(ctypes.c_int64)()
    p_ids = ctypes.POINTER(ctypes.c_int32)()
    p_cnt = ctypes.POINTER(ctypes.c_int32)()
    p_cost = ctypes.POINTER(ctypes.c_int64)()
    nnz = ctypes.c_int64()
    vocab = ctypes.c_int64()
    total_vocab = ctypes.c_int64()

    rc = lib.pt_build_index(
        concat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(concat.shape[0]),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_seq),
        ctypes.c_int32(k),
        ctypes.byref(p_ptr),
        ctypes.byref(p_ids),
        ctypes.byref(p_cnt),
        ctypes.byref(p_cost),
        ctypes.byref(nnz),
        ctypes.byref(vocab),
        ctypes.byref(total_vocab),
    )
    if rc != 0:
        return None  # -2: key overflow -> NumPy wide-key fallback

    def _take(p, count, dtype):
        # ctypes.string_at is one memcpy; np.ctypeslib.as_array would build
        # a count-element ctypes array TYPE first (~1s per 14M elements).
        nbytes = count * np.dtype(dtype).itemsize
        return np.frombuffer(
            ctypes.string_at(p, nbytes), dtype=dtype
        ).copy() if count else np.zeros(0, dtype=dtype)

    try:
        n = int(nnz.value)
        ptr = _take(p_ptr, n_seq + 1, np.int64)
        ids = _take(p_ids, n, np.int32)
        cnts = _take(p_cnt, n, np.int32)
        costs = _take(p_cost, n_seq, np.int64)
    finally:
        lib.pt_free(p_ptr)
        lib.pt_free(p_ids)
        lib.pt_free(p_cnt)
        lib.pt_free(p_cost)

    return ptr, ids, cnts, costs, int(vocab.value), int(total_vocab.value)

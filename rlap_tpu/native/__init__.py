"""ctypes binding for the native C++ oracle (no pybind11 in this image).

Replaces the reference's torch-CppExtension binding layer
(`rlap/csrc/py_api_binder.cc`, `setup.py:49-57`) with a g++-compiled shared
library loaded via ctypes; marshalling is zero-copy numpy buffers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_BUILD = _HERE / "_build"
_SRC = _HERE / "oracle.cc"
_LIB = _BUILD / "librlap_native.so"

_O_V = {"random": 0, "degree": 1, "coarsen": 2}
_O_N = {"asc": 0, "desc": 1, "random": 2}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Path:
    """Compile the shared library if stale. Thread-safe, cached."""
    with _lock:
        if _LIB.exists() and not force:
            if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
                return _LIB
        _BUILD.mkdir(exist_ok=True)
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-march=native", "-fvisibility=hidden",
            str(_SRC), "-o", str(_LIB),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(str(_LIB))
    lib.rlap_approximate_cholesky.restype = ctypes.c_int64
    lib.rlap_approximate_cholesky.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rlap_identity.restype = None
    lib.rlap_identity.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.rlap_read_tsv.restype = ctypes.c_int64
    lib.rlap_read_tsv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def oracle_approximate_cholesky(
    edge_index: np.ndarray,
    edge_weights: Optional[np.ndarray],
    num_nodes: int,
    num_remove: int,
    o_v: str = "random",
    o_n: str = "random",
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sequential-oracle Schur complement. API parity with the reference op
    (`rlap/ops.py:7-58`): edge_index [2, E] (+optional weights) in, sampled
    (edge_index [2, E'], weights [E']) out, both directions present.
    """
    lib = _load()
    edge_index = np.asarray(edge_index, np.float64)
    e = edge_index.shape[1]
    if edge_weights is None:
        edge_weights = np.ones((e,), np.float64)
    info = np.ascontiguousarray(
        np.concatenate([edge_index, np.asarray(edge_weights, np.float64)[None]],
                       axis=0).T)
    out_cap = max(4 * e + 16, 64)
    out = np.empty((out_cap, 3), np.float64)
    cnt = ctypes.c_int64(0)
    rc = lib.rlap_approximate_cholesky(
        _dptr(info), e, num_nodes, num_remove, _O_V[o_v], _O_N[o_n],
        seed, _dptr(out), out_cap, ctypes.byref(cnt))
    if rc < 0:
        raise RuntimeError(f"oracle failed with code {rc}")
    res = out[: cnt.value]
    return res[:, :2].T.astype(np.int64), res[:, 2].copy()


def oracle_identity(a: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float64)
    out = np.empty_like(a)
    lib.rlap_identity(_dptr(a), a.size, _dptr(out))
    return out


def read_tsv(path: str, cap: int = 1 << 22) -> Tuple[np.ndarray, np.ndarray]:
    """1-indexed (i, j, v) text file -> (edge_index [2, E], weights [E])."""
    lib = _load()
    out = np.empty((cap, 3), np.float64)
    cnt = lib.rlap_read_tsv(str(path).encode(), _dptr(out), cap)
    if cnt < 0:
        raise RuntimeError(f"read_tsv failed with code {cnt}")
    res = out[:cnt]
    return res[:, :2].T.astype(np.int64), res[:, 2].copy()

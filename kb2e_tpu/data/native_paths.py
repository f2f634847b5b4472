"""ctypes binding to the native PCRA path extractor (native/path_extract.cpp).

Same lazily-built-shared-library pattern as :mod:`kb2e_tpu.data.native`;
falls back to the pure-Python extractor in :mod:`kb2e_tpu.data.paths`
transparently.  Output is bit-identical modulo float summation order (tested
allclose in tests/test_ptranse_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_LIB_BASENAME = "_libkb2e_paths.so"
_SOURCE = os.path.join(os.path.dirname(__file__), "..", "..", "native", "path_extract.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), _LIB_BASENAME)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.abspath(_SOURCE)
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001 — any toolchain problem => fallback
        print(f"kb2e_paths: native build failed ({e}); using Python extractor", file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.abspath(_SOURCE)
        stale = (
            os.path.exists(_LIB_PATH)
            and os.path.exists(src)
            and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        )
        if (not os.path.exists(_LIB_PATH) or stale) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"kb2e_paths: cannot dlopen native extractor ({e})", file=sys.stderr)
            _build_failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.kb2e_extract_paths.restype = ctypes.c_int
        lib.kb2e_extract_paths.argtypes = [
            i32p, i32p, i32p, ctypes.c_int64,
            i32p, i32p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS,WRITEABLE"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def extract_path_arrays(
    heads: np.ndarray,
    tails: np.ndarray,
    rels: np.ndarray,
    n_entities: int,
    n_relations: int,
    max_len: int = 2,
    min_conf: float = 0.01,
    max_paths: int = 8,
    max_branch: int = 0,
    query_pairs=None,
):
    """Native PCRA over the (heads, tails, rels) graph for each query pair
    (default: the graph's own pairs); returns (rels [Q, P, L] int32,
    conf [Q, P] float32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native path extractor unavailable")
    h = np.ascontiguousarray(heads, dtype=np.int32)
    t = np.ascontiguousarray(tails, dtype=np.int32)
    r = np.ascontiguousarray(rels, dtype=np.int32)
    qh, qt = (h, t) if query_pairs is None else (
        np.ascontiguousarray(query_pairs[0], dtype=np.int32),
        np.ascontiguousarray(query_pairs[1], dtype=np.int32),
    )
    n = h.shape[0]
    nq = qh.shape[0]
    out_rels = np.empty((nq, max_paths, max_len), dtype=np.int32)
    out_conf = np.empty((nq, max_paths), dtype=np.float32)
    rc = lib.kb2e_extract_paths(
        h, t, r, n, qh, qt, nq, int(n_entities), int(n_relations),
        int(max_len), float(min_conf), int(max_paths), int(max_branch),
        out_rels.reshape(-1), out_conf.reshape(-1),
    )
    if rc != 0:
        raise RuntimeError(f"native path extractor failed (rc={rc})")
    return out_rels, out_conf

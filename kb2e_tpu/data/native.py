"""ctypes binding to the native C++ data loader (native/io_loader.cpp).

The shared library is built lazily on first use (single translation unit,
sub-second g++ invocation) and cached next to this module; any failure falls
back to the pure-Python parser in :mod:`kb2e_tpu.data.triples` transparently.

Contract note: the reference keeps id files and triple files in one data
directory (common/constants.h:19-23); the native loader re-reads the id maps
from the triple file's directory, so it accepts (path, entity2id, relation2id)
for signature compatibility but ignores the dicts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from kb2e_tpu import constants as C

_LIB_BASENAME = "_libkb2e_io.so"
_SOURCE = os.path.join(os.path.dirname(__file__), "..", "..", "native", "io_loader.cpp")
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
        print(f"kb2e_io: native build failed ({e}); using Python loader", file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"kb2e_io: cannot dlopen native loader ({e})", file=sys.stderr)
            _build_failed = True
            return None
        lib.kb2e_load_triples.restype = ctypes.c_long
        lib.kb2e_load_triples.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.kb2e_free.restype = None
        lib.kb2e_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_triple_file(
    path: str,
    entity2id: Dict[str, int],
    relation2id: Dict[str, int],
    **_ignored,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native parse of a triple file; signature-compatible with the Python
    loader (the id maps are re-read from the file's directory)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    data_dir = os.path.dirname(os.path.abspath(path))
    eid = os.path.join(data_dir, C.ENTITY_ID_FILE).encode()
    rid = os.path.join(data_dir, C.RELATION_ID_FILE).encode()

    h_ptr = ctypes.POINTER(ctypes.c_int32)()
    t_ptr = ctypes.POINTER(ctypes.c_int32)()
    r_ptr = ctypes.POINTER(ctypes.c_int32)()
    n_ent = ctypes.c_long()
    n_rel = ctypes.c_long()
    n = lib.kb2e_load_triples(
        eid, rid, path.encode(),
        ctypes.byref(h_ptr), ctypes.byref(t_ptr), ctypes.byref(r_ptr),
        ctypes.byref(n_ent), ctypes.byref(n_rel),
    )
    if n < 0:
        raise RuntimeError(f"native loader failed on {path}")
    try:
        if len(entity2id) and n_ent.value != len(entity2id):
            raise ValueError(
                f"{path}: native loader saw {n_ent.value} entities, caller has {len(entity2id)}"
            )
        h = np.ctypeslib.as_array(h_ptr, shape=(n,)).copy()
        t = np.ctypeslib.as_array(t_ptr, shape=(n,)).copy()
        r = np.ctypeslib.as_array(r_ptr, shape=(n,)).copy()
    finally:
        lib.kb2e_free(h_ptr)
        lib.kb2e_free(t_ptr)
        lib.kb2e_free(r_ptr)
    return h, t, r

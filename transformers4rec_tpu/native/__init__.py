"""Native (C++) host-side data kernels with lazy build and numpy fallback.

Builds ``libt4r_native.so`` from ``padding.cc`` with g++ on first use (cached
next to the source; rebuilt when the source is newer). All callers must treat
``available()`` as optional — every function has a numpy fallback in
``data/padding.py`` / ``data/loader.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "padding.cc")
_LIB = os.path.join(_HERE, "libt4r_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False
# test/benchmark hook: force the numpy fallbacks even when the lib is built
_FORCE_DISABLE = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _FORCE_DISABLE:
        return None
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    needs_build = (
        not os.path.exists(_LIB)
        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    )
    if needs_build and not _build():
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _build_failed = True
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    for name, vtype in (
        ("pad_ragged_f32", ctypes.POINTER(ctypes.c_float)),
        ("pad_ragged_i64", i64p),
        ("pad_ragged_i32", ctypes.POINTER(ctypes.c_int32)),
    ):
        fn = getattr(lib, name)
        fn.argtypes = [vtype, i64p, ctypes.c_int64, ctypes.c_int64, vtype]
        fn.restype = None
    lib.gather_rows.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p
    ]
    lib.gather_rows.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_PAD_FNS = {
    np.dtype(np.float32): "pad_ragged_f32",
    np.dtype(np.int64): "pad_ragged_i64",
    np.dtype(np.int32): "pad_ragged_i32",
}


def pad_ragged(values: np.ndarray, offsets: np.ndarray, max_len: int) -> Optional[np.ndarray]:
    """Native ragged→dense; returns None if unsupported (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values)
    fn_name = _PAD_FNS.get(values.dtype)
    if fn_name is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n_rows = len(offsets) - 1
    out = np.empty((n_rows, max_len), dtype=values.dtype)
    fn = getattr(lib, fn_name)
    fn(
        values.ctypes.data_as(fn.argtypes[0]),
        offsets.ctypes.data_as(fn.argtypes[1]),
        n_rows,
        max_len,
        out.ctypes.data_as(fn.argtypes[0]),
    )
    return out


def gather_rows(src: np.ndarray, indices: np.ndarray) -> Optional[np.ndarray]:
    """Native row gather ``src[indices]`` for batch assembly."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    row_bytes = int(src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64)))
    out = np.empty((len(indices),) + src.shape[1:], dtype=src.dtype)
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_char_p),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices),
        row_bytes,
        out.ctypes.data_as(ctypes.c_char_p),
    )
    return out

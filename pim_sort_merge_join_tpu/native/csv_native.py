"""ctypes bindings for the native CSV parser/formatter.

Loads ``libsmjcsv.so`` (built by the Makefile alongside this module; an
auto-build is attempted once if the shared object is missing and a compiler
is available). Every entry point degrades gracefully: callers check
``available()`` or get ``None`` back, and the pure-numpy path in
`columnar/csv_io.py` takes over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsmjcsv.so")
_lib = None
_tried = False


def _threads() -> int:
    return min(os.cpu_count() or 1, 16)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.csv_probe_cols.restype = ctypes.c_int
    lib.csv_probe_cols.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.csv_count_rows.restype = ctypes.c_int64
    lib.csv_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.csv_parse_i64.restype = ctypes.c_int
    lib.csv_parse_i64.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.csv_format_i64.restype = ctypes.c_int64
    lib.csv_format_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_csv(path: str) -> Optional[np.ndarray]:
    """Parse an integer CSV (with header) into a row-major int64 array."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    n = len(raw)
    ncol = lib.csv_probe_cols(raw, n)
    nrow = lib.csv_count_rows(raw, n)
    if ncol <= 0 or nrow < 0:
        return None
    out = np.empty((nrow, ncol), dtype=np.int64)
    rc = lib.csv_parse_i64(
        raw,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nrow,
        ncol,
        _threads(),
    )
    if rc != 0:
        raise ValueError(
            f"malformed CSV {path!r}: row/field structure does not match "
            f"header ({ncol} columns, {nrow} rows expected)"
        )
    return out


def format_csv_body(array: np.ndarray) -> Optional[bytes]:
    """Format a row-major int64 array as CSV body bytes (no header)."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(array, dtype=np.int64)
    nrow, ncol = arr.shape
    if nrow == 0:
        return b""
    buf = ctypes.create_string_buffer(nrow * ncol * 21)
    size = lib.csv_format_i64(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nrow,
        ncol,
        buf,
        _threads(),
    )
    return buf.raw[:size]

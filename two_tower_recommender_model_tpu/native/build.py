"""Build-on-first-use for the native TTRS reader.

Compiles `ttrs_reader.cpp` with the system g++ into the package directory and
caches the result; rebuilds when the source is newer than the library. Zero
packaging ceremony, no pybind11 — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "ttrs_reader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libttrs_reader.so")
_lock = threading.Lock()
_cached: ctypes.CDLL | None = None
_failed: str | None = None


def build_ttrs_reader(force: bool = False) -> str:
    with _lock:
        if (
            not force
            and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        ):
            return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", _LIB, "-lz",
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB


def load_ttrs_reader() -> ctypes.CDLL | None:
    """Load (building if needed). Returns None when the toolchain/zlib is
    unavailable — callers must fall back to the Python reader."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed is not None:
        return None
    try:
        lib = ctypes.CDLL(build_ttrs_reader())
    except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
        _failed = str(e)
        return None
    lib.ttrs_open.restype = ctypes.c_void_p
    lib.ttrs_open.argtypes = [ctypes.c_char_p]
    lib.ttrs_close.argtypes = [ctypes.c_void_p]
    lib.ttrs_rows.restype = ctypes.c_int64
    lib.ttrs_rows.argtypes = [ctypes.c_void_p]
    lib.ttrs_num_columns.restype = ctypes.c_int
    lib.ttrs_num_columns.argtypes = [ctypes.c_void_p]
    lib.ttrs_column_name.restype = ctypes.c_char_p
    lib.ttrs_column_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ttrs_column_dtype.restype = ctypes.c_char_p
    lib.ttrs_column_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ttrs_column_ndim.restype = ctypes.c_int
    lib.ttrs_column_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ttrs_column_dim.restype = ctypes.c_int64
    lib.ttrs_column_dim.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ttrs_column_nbytes.restype = ctypes.c_int64
    lib.ttrs_column_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ttrs_read_column.restype = ctypes.c_int
    lib.ttrs_read_column.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.ttrs_read_columns_parallel.restype = ctypes.c_int
    lib.ttrs_read_columns_parallel.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
    ]
    _cached = lib
    return lib

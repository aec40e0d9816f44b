"""Native C++ IO acceleration, loaded via ctypes.

Compiled on first use with g++ (no pybind11 in this environment); the pure-Python
readers in :mod:`diasss_tpu.io.opencv_xml` remain the fallback.  Build manually
with ``python -m diasss_tpu.native`` or CMake (CMakeLists.txt here).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "io_native.cpp")
_LIB = os.path.join(_HERE, "libdiasss_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.probe_cv_matrix.restype = ctypes.c_int
        lib.probe_cv_matrix.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_char),
        ]
        lib.read_cv_matrix.restype = ctypes.c_long
        lib.read_cv_matrix.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
        ]
        lib.read_txt_column.restype = ctypes.c_long
        lib.read_txt_column.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_DT_NP = {b"d": np.float64, b"f": np.float32, b"i": np.int64, b"s": np.int16, b"u": np.uint8}


def read_matrix(path: str, key: str) -> np.ndarray:
    """Native OpenCV-XML matrix read; raises on failure (caller falls back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    dt = ctypes.c_char()
    rc = lib.probe_cv_matrix(path.encode(), key.encode(), rows, cols, ctypes.byref(dt))
    if rc != 0:
        raise KeyError(f"probe failed ({rc}) for {key!r} in {path}")
    n = rows.value * cols.value
    buf = np.empty(n, np.float64)
    got = lib.read_cv_matrix(
        path.encode(), key.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
    )
    if got != n:
        raise ValueError(f"matrix size mismatch in {path}: read {got}, want {n}")
    out_dt = _DT_NP.get(dt.value, np.float64)
    return buf.reshape(rows.value, cols.value).astype(out_dt, copy=False)


def read_txt_column(path: str, max_vals: int = 1 << 22) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    buf = np.empty(max_vals, np.float64)
    got = lib.read_txt_column(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_vals
    )
    if got < 0:
        raise IOError(f"cannot read {path}")
    return buf[:got].copy()


if __name__ == "__main__":
    print("native IO available:", available())

"""ctypes bindings for the native npz loader/prefetcher (native/npz_loader.cc).

Builds libnpzloader.so on first use (g++, zlib) and falls back to numpy
loading when the toolchain is unavailable. SequenceDataset uses this to
overlap host IO/decompression with device compute — the role TensorFlow's
C++ tf.data runtime played for the reference (datamanagement.py:25-32,
prefetch_size=2)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnpzloader.so")
_lib = None
_lib_failed = False

_DTYPES = {
    "<f4": np.float32,
    "<f8": np.float64,
    "<i4": np.int32,
    "<i8": np.int64,
    "|b1": np.bool_,
    "<f2": np.float16,
}


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "npz_loader.cc")
        stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if not os.path.exists(_LIB_PATH) or stale:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR] + (["-B"] if stale else []),
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.npz_info.restype = ctypes.c_long
        lib.npz_info.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
        ]
        lib.npz_read.restype = ctypes.c_long
        lib.npz_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_long,
        ]
        lib.npz_prefetch.restype = ctypes.c_int
        lib.npz_prefetch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load_lib() is not None


def load_npz(path: str, member: Optional[str] = None) -> np.ndarray:
    """Load one member (default: first) of an npz file. Falls back to numpy
    if the native library is unavailable."""
    lib = _load_lib()
    if lib is None:
        with np.load(path) as f:
            key = member if member else f.files[0]
            return f[key]
    shape = (ctypes.c_long * 8)()
    ndim = ctypes.c_int()
    dtype_buf = ctypes.create_string_buffer(8)
    member_b = member.encode() if member else None
    nbytes = lib.npz_info(path.encode(), member_b, shape, ctypes.byref(ndim), dtype_buf)
    if nbytes < 0:
        with np.load(path) as f:
            key = member if member else f.files[0]
            return f[key]
    dtype = _DTYPES.get(dtype_buf.value.decode(), None)
    if dtype is None:
        with np.load(path) as f:
            key = member if member else f.files[0]
            return f[key]
    out = np.empty(tuple(shape[i] for i in range(ndim.value)), dtype)
    got = lib.npz_read(
        path.encode(), member_b, out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if got != out.nbytes:
        with np.load(path) as f:
            key = member if member else f.files[0]
            return f[key]
    return out


def prefetch(paths: Sequence[str], n_threads: int = 4) -> None:
    """Start background decoding of upcoming files into the native cache."""
    lib = _load_lib()
    if lib is None or not paths:
        return
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    lib.npz_prefetch(arr, len(paths), n_threads)

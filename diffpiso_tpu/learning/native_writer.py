"""ctypes bindings for the native npz writer (native/npz_writer.cc).

The write-side twin of native_loader.py: whole-file npz assembly (npy
members + zip container + zlib deflate) runs in C++, optionally on a
background thread pool, so datagen loops (reference: write_sim_frame ->
np.savez_compressed, fluidformat.py) never stall on host compression.
Falls back to numpy when the toolchain is unavailable.

    from diffpiso_tpu.learning.native_writer import savez, wait
    savez("frame.npz", async_=True, level=6, velocity=u, pressure=p)
    ...
    wait()   # barrier before reading the files back
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnpzwriter.so")
_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "npz_writer.cc")
        stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if not os.path.exists(_LIB_PATH) or stale:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR] + (["-B"] if stale else []),
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        for fn in (lib.npz_write, lib.npz_write_async):
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
            ]
        lib.npz_write_wait.restype = ctypes.c_int
        lib.npz_write_wait.argtypes = []
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


# ctypes keeps no reference to the array buffers once npz_write_async
# returns, but the C++ job copies everything into npy byte vectors BEFORE
# the call returns (build_job runs on the caller thread), so no pinning is
# needed beyond the call itself.
def savez(path, async_: bool = False, level: int = 6, **arrays) -> None:
    """np.savez_compressed-compatible writer. level=0 stores (np.savez),
    level>0 deflates (np.savez_compressed uses 6). async_=True enqueues the
    write on the native thread pool — call wait() before reading back."""
    lib = _load_lib()
    if lib is None:
        # numpy fallback (always synchronous)
        if level > 0:
            np.savez_compressed(path, **arrays)
        else:
            np.savez(path, **arrays)
        return

    items = [
        (k, np.ascontiguousarray(np.asarray(v))) for k, v in arrays.items()
    ]
    n = len(items)
    names = (ctypes.c_char_p * n)(*[k.encode() for k, _ in items])
    descrs = (ctypes.c_char_p * n)(
        *[_descr(a).encode() for _, a in items]
    )
    ndims = (ctypes.c_int * n)(*[a.ndim for _, a in items])
    shapes_flat = [d for _, a in items for d in a.shape]
    shapes = (ctypes.c_int64 * max(1, len(shapes_flat)))(*shapes_flat)
    datas = (ctypes.c_char_p * n)(
        *[ctypes.cast(a.ctypes.data, ctypes.c_char_p) for _, a in items]
    )
    nbytes = (ctypes.c_int64 * n)(*[a.nbytes for _, a in items])
    fn = lib.npz_write_async if async_ else lib.npz_write
    rc = fn(str(path).encode(), n, names, descrs, ndims, shapes, datas,
            nbytes, int(level))
    if rc != 0:
        raise OSError(f"native npz write failed ({rc}): {path}")


def _descr(a: np.ndarray) -> str:
    s = a.dtype.str
    if s == "|b1":
        return "|b1"
    if s[0] not in "<|":
        raise ValueError(f"non-little-endian dtype {s} unsupported")
    return s


def wait() -> None:
    """Barrier: block until every async write has landed; raise if any
    queued write failed."""
    lib = _load_lib()
    if lib is None:
        return
    errors = lib.npz_write_wait()
    if errors:
        raise OSError(f"{errors} async npz write(s) failed")

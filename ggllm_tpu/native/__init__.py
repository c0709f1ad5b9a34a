"""ctypes bindings for the native (C++) codec library.

The library (native/quants.cpp) accelerates the host-side hot paths —
model-load dequantization and the quantizer tool — with multithreaded,
bit-faithful block codecs. It is built on demand with g++ the first time
it's needed and cached next to the source; everything degrades gracefully
to the pure-Python codecs (quant/legacy.py, quant/kquants.py) when a
compiler is unavailable or GGLLM_TPU_NO_NATIVE is set.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _SRC_DIR / "libggllmq.so"


def _build() -> bool:
    src = _SRC_DIR / "quants.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-ffp-contract=off", "-pthread", "-o", str(_SO), str(src)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GGLLM_TPU_NO_NATIVE"):
            return None
        if not _SO.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.gq_dequantize.restype = ctypes.c_int
        lib.gq_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.gq_quantize.restype = ctypes.c_int
        lib.gq_quantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.gq_block_size.restype = ctypes.c_int
        lib.gq_type_size.restype = ctypes.c_int
        if hasattr(lib, "gq_repack"):
            lib.gq_repack.restype = ctypes.c_int
            lib.gq_repack.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return _lib


def dequantize(gtype: int, blob: np.ndarray, n: int, nthreads: int = 0):
    """Native dequantize; returns None when the format/lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    bs = lib.gq_block_size(int(gtype))
    if bs == 0 or n % bs != 0:
        return None
    blob = np.ascontiguousarray(blob, dtype=np.uint8)
    nb = n // bs
    if blob.nbytes < nb * lib.gq_type_size(int(gtype)):
        return None
    out = np.empty(n, dtype=np.float32)
    nthreads = nthreads or min(16, os.cpu_count() or 1)
    rc = lib.gq_dequantize(
        int(gtype), blob.ctypes.data, out.ctypes.data, nb, nthreads)
    return out if rc == 0 else None


def repack_plane(gtype: int, plane: int, qdata: np.ndarray, O: int, K: int,
                 kp: int, ck: int, rows: int):
    """Planar code bytes -> fused-kernel packed plane (n_k, rows, O), or
    None when the lib/format is unavailable (kernels/layout falls back to
    the numpy path). plane 0 = 4-bit/int8 codes, 1 = q5 high bits."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gq_repack"):
        return None
    qdata = np.ascontiguousarray(qdata)
    row_bytes = qdata.nbytes // O
    out = np.empty((kp // ck, rows, O), dtype=np.uint8)
    rc = lib.gq_repack(int(gtype), int(plane), qdata.ctypes.data,
                       row_bytes, O, K, kp, ck, out.ctypes.data, 0)
    return out if rc == 0 else None


def quantize(gtype: int, x: np.ndarray, nthreads: int = 0):
    """Native quantize (legacy formats); None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    bs = lib.gq_block_size(int(gtype))
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if bs == 0 or x.size % bs != 0:
        return None
    nb = x.size // bs
    out = np.empty(nb * lib.gq_type_size(int(gtype)), dtype=np.uint8)
    nthreads = nthreads or min(16, os.cpu_count() or 1)
    rc = lib.gq_quantize(int(gtype), x.ctypes.data, out.ctypes.data, nb, nthreads)
    return out if rc == 0 else None

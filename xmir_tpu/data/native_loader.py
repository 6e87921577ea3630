"""ctypes bindings for the native npy loader (native/xmir_loader.cpp).

Builds the shared library on first use (g++ available per environment),
caches it next to the source, and falls back to the pure-Python path when the
toolchain or binary is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "xmir_loader.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libxmir_loader.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.xmir_load_npy.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.xmir_load_npy.restype = ctypes.c_int
        lib.xmir_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.xmir_load_npy_batch.restype = ctypes.c_int
        lib.xmir_load_npy_crop.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.xmir_load_npy_crop.restype = ctypes.c_int
        lib.xmir_load_npy_batch_crop.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.xmir_load_npy_batch_crop.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def load_npy_image(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Load one .npy -> (out_h, out_w, 3) uint8 via the native path."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.xmir_load_npy(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
    )
    if rc != 0:
        raise ValueError(f"native npy load failed ({rc}): {path}")
    return out


def load_npy_batch(
    paths: Sequence[str], out_h: int, out_w: int, n_threads: int = 0
) -> np.ndarray:
    """Parallel batch load -> (N, out_h, out_w, 3) uint8."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    status = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.xmir_load_npy_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, n_threads, status,
    )
    if failures:
        bad = [paths[i] for i in range(n) if status[i] != 0]
        raise ValueError(f"native batch load: {failures} failures, e.g. {bad[:3]}")
    return out


def load_npy_image_crop(path: str, size: int) -> np.ndarray:
    """Aspect-preserving Resize(short=size)+CenterCrop(size) ->
    (size, size, 3) uint8 (torchvision eval-transform semantics)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.xmir_load_npy_crop(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size
    )
    if rc != 0:
        raise ValueError(f"native npy load failed ({rc}): {path}")
    return out


def load_npy_batch_crop(
    paths: Sequence[str], size: int, n_threads: int = 0
) -> np.ndarray:
    """Parallel aspect-preserving batch load -> (N, size, size, 3) uint8."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    status = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.xmir_load_npy_batch_crop(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, n_threads, status,
    )
    if failures:
        bad = [paths[i] for i in range(n) if status[i] != 0]
        raise ValueError(f"native batch load: {failures} failures, e.g. {bad[:3]}")
    return out

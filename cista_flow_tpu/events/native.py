"""ctypes bindings for the native (C++) event-ingestion kernels.

Builds ``native/libcista_events.so`` on first use (g++ available in the
image) and falls back to the numpy implementations transparently if the
toolchain is missing. Results are bit-identical to the numpy path (same
sequential accumulation order) — pinned by tests/test_native_events.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcista_events.so")

_lib = None
_tried = False


def _build():
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        f8 = ctypes.POINTER(ctypes.c_double)
        f4 = ctypes.POINTER(ctypes.c_float)
        lib.voxelize_events.argtypes = [
            f8, f8, f8, f8, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, f4]
        lib.preprocess_std.argtypes = [
            f4, ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.voxelize_triangular.argtypes = [
            f8, f8, f8, f8, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f4]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"[cista_flow_tpu] native event kernels unavailable ({e}); "
              "using numpy fallback")
        _lib = None
    return _lib


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def voxelize_events(events: np.ndarray, num_bins: int, width: int,
                    height: int, is_reverse: bool = False) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    e = _as_f64(events)
    t, x, y, p = (np.ascontiguousarray(e[:, i]) for i in range(4))
    out = np.zeros((num_bins, height, width), np.float32)
    lib.voxelize_events(
        _ptr64(t), _ptr64(x), _ptr64(y), _ptr64(p), len(e), num_bins,
        height, width, int(is_reverse),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def preprocess_std(voxel: np.ndarray, filter_hot_pixel: bool = False) -> bool:
    """In-place std preprocess; returns False if native lib unavailable."""
    lib = get_lib()
    if lib is None or not voxel.flags.c_contiguous or voxel.dtype != np.float32:
        return False
    lib.preprocess_std(
        voxel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), voxel.size,
        voxel.shape[0], int(filter_hot_pixel))
    return True


def voxelize_triangular(events_xytp: np.ndarray, num_bins: int, height: int,
                        width: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    e = _as_f64(events_xytp)
    x, y, t, p = (np.ascontiguousarray(e[:, i]) for i in range(4))
    out = np.zeros((num_bins, height, width), np.float32)
    lib.voxelize_triangular(
        _ptr64(t), _ptr64(x), _ptr64(y), _ptr64(p), len(e), num_bins,
        height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out

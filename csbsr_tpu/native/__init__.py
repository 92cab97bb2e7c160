"""ctypes bindings for the native (C++) eval kernels.

Build with `make -C csbsr_tpu/native` (or the Makefile at repo root).
Falls back silently to the numpy/scipy implementations when the shared
library is absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcsbsr_native.so")
_lib = None


def _try_build() -> bool:
    src = os.path.join(os.path.dirname(__file__), "surface_distance.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.csbsr_surface_metrics.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    lib.csbsr_edt.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def surface_metrics_native(
    preds: np.ndarray, gts: np.ndarray, percentile: float = 50.0,
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """preds: (B,T,H,W) bool/uint8; gts: (B,1,H,W). Returns (hd, msd) or None."""
    lib = load()
    if lib is None:
        return None
    preds = np.ascontiguousarray(preds.astype(np.uint8))
    gts = np.ascontiguousarray(gts.astype(np.uint8))
    b, t, h, w = preds.shape
    hd = np.zeros((b, t), np.float64)
    msd = np.zeros((b, t), np.float64)
    lib.csbsr_surface_metrics(
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, t, h, w, float(percentile),
        hd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        msd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_threads),
    )
    return hd, msd


def edt_native(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    out = np.zeros((h, w), np.float64)
    lib.csbsr_edt(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out

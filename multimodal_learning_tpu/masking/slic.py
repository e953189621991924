"""SLIC superpixels: native C++ kernel with build-on-demand + numpy fallback.

Replaces the reference's ``fast_slic`` dependency
(``MIA 2023/stage1.../data_loaders_MT_SP.py:28``:
``Slic(num_components=opt.num_superpixels, compactness=10).iterate(img)``).
The C++ implementation lives in ``native/slic/slic.cpp`` and is compiled on
first use with g++ (-O3 -fopenmp); a vectorised numpy implementation backs it
up when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "slic", "slic.cpp")
_LIB_PATH = os.path.join(_REPO, "native", "slic", "libslic.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
                     "-o", _LIB_PATH], check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.slic_segment.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            lib.slic_segment.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def _slic_numpy(img: np.ndarray, num_components: int, compactness: float,
                iterations: int) -> np.ndarray:
    """Vectorised numpy SLIC (fallback; RGB distance instead of LAB)."""
    H, W = img.shape[:2]
    S = max(1.0, np.sqrt(H * W / num_components))
    f = img.astype(np.float32)
    per_row = max(1, int(round(W / S)))
    rows = (num_components + per_row - 1) // per_row
    ks = np.arange(num_components)
    cx = np.minimum(W - 1, ((ks % per_row + 0.5) * W / per_row)).astype(int)
    cy = np.minimum(H - 1, ((ks // per_row + 0.5) * H / rows)).astype(int)
    centers_c = f[cy, cx]                       # [K, 3]
    centers_xy = np.stack([cx, cy], 1).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    inv_s2 = (compactness ** 2) / (S ** 2)
    labels = np.zeros((H, W), np.int32)
    for _ in range(iterations):
        dist = np.full((H, W), np.inf, np.float32)
        for k in range(num_components):
            x0, x1 = max(0, int(centers_xy[k, 0] - 2 * S)), \
                min(W, int(centers_xy[k, 0] + 2 * S) + 1)
            y0, y1 = max(0, int(centers_xy[k, 1] - 2 * S)), \
                min(H, int(centers_xy[k, 1] + 2 * S) + 1)
            dc = ((f[y0:y1, x0:x1] - centers_c[k]) ** 2).sum(-1)
            dxy = ((xx[y0:y1, x0:x1] - centers_xy[k, 0]) ** 2
                   + (yy[y0:y1, x0:x1] - centers_xy[k, 1]) ** 2)
            d = dc + dxy * inv_s2
            m = d < dist[y0:y1, x0:x1]
            dist[y0:y1, x0:x1][m] = d[m]
            labels[y0:y1, x0:x1][m] = k
        for k in range(num_components):
            mask = labels == k
            if mask.any():
                centers_c[k] = f[mask].mean(0)
                centers_xy[k] = [xx[mask].mean(), yy[mask].mean()]
    return labels


def slic_segment(img: np.ndarray, num_components: int = 100,
                 compactness: float = 10.0,
                 iterations: int = 10) -> np.ndarray:
    """img uint8 [H, W, 3] -> int32 labels [H, W] in [0, num_components)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    lib = _load_lib()
    if lib is None:
        return _slic_numpy(img, num_components, compactness, iterations)
    H, W = img.shape[:2]
    labels = np.zeros((H, W), dtype=np.int32)
    lib.slic_segment(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        num_components, compactness, iterations,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels

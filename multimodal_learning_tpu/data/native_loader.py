"""ctypes wrapper for the native data-loader core (``native/datacore``).

Provides libjpeg decode with OpenMP batch parallelism and fused random-crop
assembly; falls back to PIL when the toolchain is unavailable.  This is the
native replacement for the reference's DataLoader worker tier
(``data_loaders_MT.py:47-77``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "datacore", "datacore.cpp")
_LIB_PATH = os.path.join(_REPO, "native", "datacore", "libdatacore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
                     "-ljpeg", "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dc_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.dc_jpeg_dims.restype = ctypes.c_int
            lib.dc_decode_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.dc_decode_jpeg.restype = ctypes.c_int
            lib.dc_decode_crop_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.dc_decode_crop_batch.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG bytes -> uint8 [H, W, 3]; None on failure/fallback."""
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(0), ctypes.c_int(0)
    if lib.dc_jpeg_dims(data, len(data), ctypes.byref(h),
                        ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.dc_decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_crop_batch(paths: Sequence[str], views: int, crop: int,
                      seeds: Sequence[int]) -> Optional[np.ndarray]:
    """Decode + random-crop a whole batch natively.

    Returns uint8 [N, views, crop, crop, 3], or None if unavailable or any
    file failed (caller falls back to the PIL path)."""
    lib = _load()
    if lib is None:
        return None
    blobs: List[bytes] = []
    for p in paths:
        with open(p, "rb") as fh:
            blobs.append(fh.read())
    n = len(blobs)
    buf_arr = (ctypes.c_char_p * n)(*blobs)
    len_arr = (ctypes.c_long * n)(*[len(b) for b in blobs])
    seed_arr = (ctypes.c_uint64 * n)(*[s & (2 ** 64 - 1) for s in seeds])
    out = np.empty((n, views, crop, crop, 3), dtype=np.uint8)
    failures = lib.dc_decode_crop_batch(
        buf_arr, len_arr, n, views, crop, seed_arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if failures == 0 else None

"""ctypes bindings for the native host data library (native/nm_host.cpp).

Auto-builds ``libnm_host.so`` with g++ on first use when missing; falls
back to the NumPy paths transparently when no toolchain is available
(everything keeps working, just slower on the host).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnm_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.nm_voxelize_batch.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int, f32p]
    lib.nm_normalize_episodic.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_void_p, ctypes.c_int64]
    lib.nm_crop_strided.argtypes = [f32p, f32p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64]
    lib.nm_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize_batch(points: np.ndarray, grid_size: int) -> np.ndarray:
    """(F, N, 3) float32 -> (F, G, G, G, 1) float32 via the native lib;
    falls back to the NumPy voxelizer."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    F, N, _ = pts.shape
    if lib is None:
        from ..ops.voxelize import voxelize_np
        return np.stack([voxelize_np(pts[f], grid_size) for f in range(F)])
    out = np.empty((F, grid_size ** 3), dtype=np.float32)
    lib.nm_voxelize_batch(pts, F, N, grid_size, out)
    return out.reshape(F, grid_size, grid_size, grid_size, 1)


def normalize_episodic(seq: np.ndarray, scale: float = 1.0,
                       x_trans: float = 0.0, z_trans: float = 0.0,
                       joints: Optional[np.ndarray] = None):
    """In-place-equivalent of data.pipeline.episodic_normalization."""
    lib = _load()
    if lib is None:
        from .pipeline import episodic_normalization
        return episodic_normalization(seq, scale, x_trans, z_trans,
                                      joints=joints)
    out = np.ascontiguousarray(seq, dtype=np.float32).copy()
    T, N, _ = out.shape
    if joints is not None:
        j = np.ascontiguousarray(joints, dtype=np.float32).copy()
        K = j.shape[1]
        lib.nm_normalize_episodic(
            out, T, N, scale, x_trans, z_trans,
            j.ctypes.data_as(ctypes.c_void_p), K)
        return out, j
    lib.nm_normalize_episodic(out, T, N, scale, x_trans, z_trans, None, 0)
    return out

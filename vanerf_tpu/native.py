"""ctypes bindings for the native CPU geometry library (native/).

Used by the offline preprocessor and as a fast independent oracle in tests.
Builds lazily with `make -C native` on first use; every caller must handle
`available() == False` (the JAX-CPU ops are the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libvanerf_geom.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.point_mesh_query.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p, i32p, f32p]
    lib.rasterize.argtypes = [
        f32p, f32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, i32p, f32p, f32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def point_mesh_query_native(points: np.ndarray, triangles: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(N,3) points x (F,3,3) triangles -> (d2, face_idx, winding)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = np.ascontiguousarray(points, np.float32)
    tri = np.ascontiguousarray(triangles, np.float32).reshape(-1, 9)
    n, f = len(pts), len(tri)
    d2 = np.empty(n, np.float32)
    idx = np.empty(n, np.int32)
    wind = np.empty(n, np.float32)
    lib.point_mesh_query(_fp(pts), n, _fp(tri), f, _fp(d2), _ip(idx),
                         _fp(wind))
    return d2, idx, wind


def rasterize_native(verts_xy: np.ndarray, verts_z: np.ndarray,
                     faces: np.ndarray, H: int, W: int):
    """Z-buffer rasterization -> (pix_to_face (H*W,), bary (H*W,3),
    zbuf (H*W,))."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    vxy = np.ascontiguousarray(verts_xy, np.float32)
    vz = np.ascontiguousarray(verts_z, np.float32).reshape(-1)
    fc = np.ascontiguousarray(faces, np.int32)
    n_pix = H * W
    face = np.empty(n_pix, np.int32)
    z = np.empty(n_pix, np.float32)
    bary = np.empty((n_pix, 3), np.float32)
    lib.rasterize(_fp(vxy), _fp(vz), len(vxy), _ip(fc), len(fc),
                  H, W, _ip(face), _fp(z), _fp(bary))
    return face, bary, z

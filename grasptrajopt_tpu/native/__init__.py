"""ctypes bindings for the geomcore native library (native/geomcore.cpp).

Builds on demand with g++ (no pybind11 dependency); every entry point has
a pure-Python fallback elsewhere in the framework, so the package works
without a compiler — the native path just makes host-side asset prep and
CPU-side NN queries faster.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "geomcore.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libgeomcore.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile libgeomcore.so with g++; returns success."""
    if os.path.exists(_LIB) and not force:
        return True
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) and not build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.geom_load_obj.restype = ctypes.c_void_p
    lib.geom_load_obj.argtypes = [ctypes.c_char_p]
    lib.geom_load_stl.restype = ctypes.c_void_p
    lib.geom_load_stl.argtypes = [ctypes.c_char_p]
    lib.geom_mesh_num_vertices.restype = ctypes.c_int64
    lib.geom_mesh_num_vertices.argtypes = [ctypes.c_void_p]
    lib.geom_mesh_num_faces.restype = ctypes.c_int64
    lib.geom_mesh_num_faces.argtypes = [ctypes.c_void_p]
    lib.geom_mesh_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.geom_mesh_free.argtypes = [ctypes.c_void_p]
    lib.geom_kdtree_build.restype = ctypes.c_void_p
    lib.geom_kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.geom_kdtree_query.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.geom_kdtree_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def load_mesh_native(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Load OBJ/STL via geomcore; returns (vertices, faces) or None."""
    lib = _load()
    if lib is None:
        return None
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        handle = lib.geom_load_obj(path.encode())
    elif ext == ".stl":
        handle = lib.geom_load_stl(path.encode())
    else:
        return None
    if not handle:
        return None
    try:
        nv = lib.geom_mesh_num_vertices(handle)
        nf = lib.geom_mesh_num_faces(handle)
        vertices = np.empty((nv, 3), dtype=np.float64)
        faces = np.empty((nf, 3), dtype=np.int32)
        lib.geom_mesh_copy(
            handle,
            vertices.ctypes.data_as(ctypes.c_void_p),
            faces.ctypes.data_as(ctypes.c_void_p),
        )
        return vertices, faces
    finally:
        lib.geom_mesh_free(handle)


class NativeKDTree:
    """Nearest-neighbor queries backed by the C++ median-split KD-tree."""

    def __init__(self, points: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("geomcore native library unavailable")
        self._lib = lib
        self._points = np.ascontiguousarray(points, dtype=np.float64)
        assert self._points.ndim == 2 and self._points.shape[1] == 3
        self._handle = lib.geom_kdtree_build(
            self._points.ctypes.data_as(ctypes.c_void_p), self._points.shape[0]
        )

    def query(self, queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, dtype=np.float64)
        m = q.shape[0]
        dists = np.empty(m, dtype=np.float64)
        idx = np.empty(m, dtype=np.int32)
        self._lib.geom_kdtree_query(
            self._handle,
            q.ctypes.data_as(ctypes.c_void_p),
            m,
            dists.ctypes.data_as(ctypes.c_void_p),
            idx.ctypes.data_as(ctypes.c_void_p),
        )
        return dists, idx

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.geom_kdtree_free(self._handle)
            self._handle = None

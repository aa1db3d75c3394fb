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
    """Compile libgeomcore.so with g++; returns success. Rebuilds when the
    source is newer than the library."""
    if (
        os.path.exists(_LIB)
        and not force
        and (not os.path.exists(_SRC) or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC))
    ):
        return True
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _LIB]
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
    if not build():
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
    lib.geom_rasterize.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,  # verts_cam, n_verts
        ctypes.c_void_p, ctypes.c_int64,  # faces, n_faces
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # W, H, obj_id
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # depth, id, face
    ]
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


def rasterize_native(
    verts_cam: np.ndarray,
    faces: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    obj_id: int,
    depth_buf: np.ndarray,
    id_buf: np.ndarray,
    face_buf: Optional[np.ndarray] = None,
) -> bool:
    """Z-buffer rasterize one camera-frame mesh into caller-owned buffers
    (geomcore geom_rasterize). Returns False when the native lib is absent
    — the caller falls back to envs/render.py's numpy path."""
    lib = _load()
    if lib is None:
        return False
    v = np.ascontiguousarray(verts_cam, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    assert depth_buf.dtype == np.float32 and depth_buf.flags.c_contiguous
    assert id_buf.dtype == np.int32 and id_buf.flags.c_contiguous
    fb = None
    if face_buf is not None:
        assert face_buf.dtype == np.int32 and face_buf.flags.c_contiguous
        fb = face_buf.ctypes.data_as(ctypes.c_void_p)
    lib.geom_rasterize(
        v.ctypes.data_as(ctypes.c_void_p), v.shape[0],
        f.ctypes.data_as(ctypes.c_void_p), f.shape[0],
        float(fx), float(fy), float(cx), float(cy),
        int(width), int(height), int(obj_id),
        depth_buf.ctypes.data_as(ctypes.c_void_p),
        id_buf.ctypes.data_as(ctypes.c_void_p),
        fb,
    )
    return True


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

"""Loader for the native C++ helpers: builds with g++ on first use, caches the
shared library next to the sources, falls back to pure Python when unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, 'libmeshbuild.so')
_SRC = os.path.join(_DIR, 'meshbuild.cpp')
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _SO],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.build_face_tables_2d.restype = ctypes.c_int
        lib.build_face_tables_2d.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,              # points
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,  # polys
            ctypes.c_void_p, ctypes.c_int64,              # boundary edges
            ctypes.c_int32,                               # default boundary id
            ctypes.c_void_p, ctypes.c_void_p,             # centers, volumes
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def build_face_tables_2d(points, polys_padded, boundary_edge_rows, default_boundary_id):
    """numpy in/out wrapper; returns None if the native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    polys = np.ascontiguousarray(polys_padded, np.int32)
    n_cells, max_verts = polys.shape
    bed = np.ascontiguousarray(boundary_edge_rows, np.int32) if len(boundary_edge_rows) else np.zeros((0, 3), np.int32)
    centers = np.zeros((n_cells, 2), np.float32)
    volumes = np.zeros((n_cells,), np.float32)
    neighbors = np.zeros((n_cells, max_verts), np.int32)
    areas = np.zeros((n_cells, max_verts), np.float32)
    f_centers = np.zeros((n_cells, max_verts, 2), np.float32)
    normals = np.zeros((n_cells, max_verts, 2), np.float32)
    distances = np.zeros((n_cells, max_verts), np.float32)
    rc = lib.build_face_tables_2d(
        points.ctypes.data, points.shape[0],
        polys.ctypes.data, n_cells, max_verts,
        bed.ctypes.data, bed.shape[0],
        np.int32(default_boundary_id),
        centers.ctypes.data, volumes.ctypes.data,
        neighbors.ctypes.data, areas.ctypes.data, f_centers.ctypes.data,
        normals.ctypes.data, distances.ctypes.data)
    if rc != 0:
        return None
    return centers, volumes, neighbors, areas, f_centers, normals, distances

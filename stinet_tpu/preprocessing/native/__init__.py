"""ctypes bindings for the native decimator (see decimator.cpp). The shared
library is compiled on first use with g++ and cached next to the source —
hermetic, no pip/pybind11 required."""
import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decimator.cpp")
_LIB = os.path.join(_DIR, "libdecimator.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.qem_decimate.restype = ctypes.c_int
    lib.qem_decimate.argtypes = [ctypes.c_int, ctypes.c_int, dp, ip,
                                 ctypes.c_int, dp, ip, ip, ip]
    lib.cluster_decimate.restype = ctypes.c_int
    lib.cluster_decimate.argtypes = [ctypes.c_int, ctypes.c_int, dp, ip,
                                     ctypes.c_double, dp, ip, ip, ip]
    lib.rasterize_depth.restype = None
    lib.rasterize_depth.argtypes = [ctypes.c_int, ctypes.c_int, dp, ip,
                                    ctypes.c_int, ctypes.c_int, dp]
    _lib = lib
    return lib


def _as_c(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def qem_decimate(vertices: np.ndarray, faces: np.ndarray, target_nv: int):
    """QEM edge-collapse to ~target_nv vertices.
    Returns (out_vertices [M,3], out_faces [F,3], trace [N] -> [0,M))."""
    lib = get_lib()
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    nv, nf = len(v), len(f)
    out_v = np.empty((nv, 3), np.float64)
    out_f = np.empty((max(nf, 1), 3), np.int32)
    out_nf = np.zeros(1, np.int32)
    trace = np.empty(nv, np.int32)
    out_nv = lib.qem_decimate(
        nv, nf, _as_c(v, ctypes.c_double), _as_c(f, ctypes.c_int),
        int(target_nv), _as_c(out_v, ctypes.c_double),
        _as_c(out_f, ctypes.c_int), _as_c(out_nf, ctypes.c_int),
        _as_c(trace, ctypes.c_int))
    if out_nv < 0:
        raise ValueError(
            f"face ids out of range [0, {nv}) (corrupt mesh data?)")
    return (out_v[:out_nv].copy(), out_f[:int(out_nf[0])].copy(),
            trace.astype(np.int64))


def cluster_decimate(vertices: np.ndarray, faces: np.ndarray,
                     cell_size: float):
    """Uniform-grid vertex clustering; same return contract as
    qem_decimate."""
    lib = get_lib()
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    nv, nf = len(v), len(f)
    out_v = np.empty((nv, 3), np.float64)
    out_f = np.empty((max(nf, 1), 3), np.int32)
    out_nf = np.zeros(1, np.int32)
    trace = np.empty(nv, np.int32)
    out_nv = lib.cluster_decimate(
        nv, nf, _as_c(v, ctypes.c_double), _as_c(f, ctypes.c_int),
        float(cell_size), _as_c(out_v, ctypes.c_double),
        _as_c(out_f, ctypes.c_int), _as_c(out_nf, ctypes.c_int),
        _as_c(trace, ctypes.c_int))
    if out_nv < 0:
        raise ValueError(
            f"face ids out of range [0, {nv}) (corrupt mesh data?)")
    return (out_v[:out_nv].copy(), out_f[:int(out_nf[0])].copy(),
            trace.astype(np.int64))


def rasterize_depth(points_px: np.ndarray, faces: np.ndarray,
                    width: int, height: int) -> np.ndarray:
    """Z-buffer of the mesh given projected vertices [N, 3] =
    (pixel_x, pixel_y, camera_depth). Returns [height, width] float64
    (+inf where nothing renders)."""
    lib = get_lib()
    p = np.ascontiguousarray(points_px, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    zbuf = np.full(height * width, np.inf, np.float64)
    lib.rasterize_depth(len(p), len(f), _as_c(p, ctypes.c_double),
                        _as_c(f, ctypes.c_int), int(width), int(height),
                        _as_c(zbuf, ctypes.c_double))
    return zbuf.reshape(height, width)

"""ctypes bindings for the native edge-set builder (graph_builder.cpp).

Compiled on first use with g++ and cached next to the source (same hermetic
pattern as preprocessing/native). The native path is a bit-for-bit
replacement for graph/build.py's numpy `_pad_edge_set` pipeline; dispatch
lives there (env ``STINET_NATIVE_BUILD=0`` forces the numpy path).
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_builder.cpp")
_LIB = os.path.join(_DIR, "libgraph_builder.so")

_lib = None
_lib_failed = False
_lib_lock = threading.Lock()
_i64 = ctypes.c_int64
_p_i64 = ctypes.POINTER(ctypes.c_int64)
_p_i32 = ctypes.POINTER(ctypes.c_int32)
_p_f32 = ctypes.POINTER(ctypes.c_float)


def _build_lib():
    # compile to a unique temp path then os.replace: concurrent builders
    # (preprocessing process pool) each produce a complete .so and the
    # rename is atomic — a half-written library can never land at _LIB
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def get_lib():
    """Load (compiling if stale) the shared library; None if unavailable.
    A failed compile is cached so the numpy fallback doesn't pay a g++
    subprocess spawn per call."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build_lib()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            _lib_failed = True
            return None
        lib.edge_set_build.restype = ctypes.c_void_p
        lib.edge_set_build.argtypes = [
            _p_i64, _p_i64, _i64, _i64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, _i64]
        lib.edge_set_sizes.restype = None
        lib.edge_set_sizes.argtypes = [ctypes.c_void_p, _p_i64]
        lib.edge_set_fill.restype = None
        lib.edge_set_fill.argtypes = [
            ctypes.c_void_p, _i64, _i64, _p_i32, _p_i32, _p_f32, _p_i32,
            _p_i32, _p_f32, _p_f32, _p_i32, _p_i32]
        lib.edge_set_free.restype = None
        lib.edge_set_free.argtypes = [ctypes.c_void_p]
        lib.build_children.restype = _i64
        lib.build_children.argtypes = [
            _p_i32, _i64, _i64, ctypes.c_int32, _i64, _p_i32, _p_f32]
        lib.rcm_order.restype = ctypes.c_int
        lib.rcm_order.argtypes = [_p_i64, _p_i64, _i64, _i64, _p_i32]
        lib.adj_build.restype = ctypes.c_void_p
        lib.adj_build.argtypes = [_p_i64, _p_i64, _i64, _i64]
        lib.adj_disk_update.restype = _i64
        lib.adj_disk_update.argtypes = [ctypes.c_void_p, _i64, _i64, _p_f32]
        lib.adj_free.restype = None
        lib.adj_free.argtypes = [ctypes.c_void_p]
        lib.edges_from_faces.restype = _i64
        lib.edges_from_faces.argtypes = [_p_i64, _i64, _i64, _p_i64, _p_i64]
        _lib = lib
        return lib


def available() -> bool:
    return (os.environ.get("STINET_NATIVE_BUILD", "1") != "0"
            and get_lib() is not None)


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_edge_set_tables(src64: np.ndarray, dst64: np.ndarray, e_pad: int,
                          trash: int, v_pad: int, max_deg: int,
                          cap_quantile: float, max_spill_frac: float,
                          window_halo, bucket):
    """Native twin of build.py's `_pad_edge_set` body (sort + `_build_ell` +
    pad). Returns the same field dict the numpy path assembles. `bucket` is
    build.py's bucket_size (the spill pad policy stays Python-side)."""
    lib = get_lib()
    e = int(src64.shape[0])
    # hard check (not an assert): edge_set_fill memcpy's e entries into
    # np.empty(e_pad) buffers — e > e_pad under python -O would be a heap
    # overflow (the numpy fallback fails loudly in the same situation)
    if e > e_pad:
        raise ValueError(f"edge bucket too small: {e} > {e_pad}")
    src64 = np.ascontiguousarray(src64, dtype=np.int64)
    dst64 = np.ascontiguousarray(dst64, dtype=np.int64)
    halo = -1 if window_halo is None else int(window_halo)
    h = lib.edge_set_build(
        _ptr(src64, ctypes.c_int64), _ptr(dst64, ctypes.c_int64), e,
        v_pad, trash, max_deg, cap_quantile, max_spill_frac, halo)
    if not h:
        raise ValueError(
            f"edge ids out of range [0, {v_pad}) in native edge-set build "
            f"(corrupted graph data?)")
    try:
        sizes = np.zeros(4, np.int64)
        lib.edge_set_sizes(h, _ptr(sizes, ctypes.c_int64))
        has_ell, d_cap, d_out, n_spill = (int(s) for s in sizes)

        src_out = np.empty(e_pad, np.int32)
        dst_out = np.empty(e_pad, np.int32)
        degree = np.empty(v_pad, np.float32)
        nbr = rev = out_deg = ell_deg = sp_src = sp_dst = None
        s_pad = 0
        if has_ell:
            nbr = np.empty((v_pad, d_cap), np.int32)
            rev = np.empty((v_pad, d_out), np.int32)
            out_deg = np.empty(v_pad, np.float32)
            ell_deg = np.empty(v_pad, np.float32)
            if n_spill:
                s_pad = bucket(n_spill, 128)
                sp_src = np.empty(s_pad, np.int32)
                sp_dst = np.empty(s_pad, np.int32)

        def p32(a):
            return _ptr(a, ctypes.c_int32) if a is not None else None

        def pf(a):
            return _ptr(a, ctypes.c_float) if a is not None else None

        lib.edge_set_fill(h, e_pad, s_pad, p32(src_out), p32(dst_out),
                          pf(degree), p32(nbr), p32(rev), pf(out_deg),
                          pf(ell_deg), p32(sp_src), p32(sp_dst))
    finally:
        lib.edge_set_free(h)

    kw = {}
    if has_ell:
        kw = dict(nbr=nbr, rev_dst=rev, out_degree=out_deg,
                  ell_degree=ell_deg, spill_src=sp_src, spill_dst=sp_dst,
                  halo=window_halo)
    return dict(src=src_out, dst=dst_out, num_edges=np.int32(e),
                degree=degree, **kw)


def rcm_order(edges: np.ndarray, n: int) -> np.ndarray:
    """Native twin of scipy's reverse_cuthill_mckee on the symmetrized
    graph: order[new_id] = old_id. Tie-breaks may differ from scipy's; the
    caller treats any bandwidth-reducing relabeling as equivalent."""
    lib = get_lib()
    src = np.ascontiguousarray(edges[0], dtype=np.int64)
    dst = np.ascontiguousarray(edges[1], dtype=np.int64)
    out = np.empty(n, np.int32)
    rc = lib.rcm_order(_ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
                       src.shape[0], n, _ptr(out, ctypes.c_int32))
    if rc != 0:
        raise ValueError(
            f"edge ids out of range [0, {n}) in native RCM "
            f"(corrupted graph data?)")
    return out


def edges_from_faces(faces: np.ndarray, num_vertices: int) -> np.ndarray:
    """Native twin of preprocessing.graph_levels.edges_from_faces: directed
    deduped [2, E] edges in exactly the numpy path's first-occurrence
    order (hash dedup, O(F) vs the composite-key sort's O(F log F))."""
    lib = get_lib()
    f = np.ascontiguousarray(faces, dtype=np.int64)
    nf = f.shape[0]
    src = np.empty(6 * nf, np.int64)
    dst = np.empty(6 * nf, np.int64)
    e = int(lib.edges_from_faces(
        _ptr(f, ctypes.c_int64), nf, num_vertices,
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64)))
    if e < 0:
        raise ValueError(
            f"face ids out of range [0, {num_vertices}) (corrupted mesh?)")
    return np.stack([src[:e], dst[:e]])


class Adjacency:
    """Reusable symmetrized-CSR adjacency over the native handle, for
    repeated bounded-BFS disk updates (preprocessing/masks.py). The handle
    owns per-BFS scratch, so one instance serves many disks cheaply."""

    def __init__(self, edges: np.ndarray, num_vertices: int):
        self._h = None
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError(
                "native graph builder unavailable (no g++ / compile "
                "failed); use the scipy adjacency path instead")
        src = np.ascontiguousarray(edges[0], dtype=np.int64)
        dst = np.ascontiguousarray(edges[1], dtype=np.int64)
        self.num_vertices = int(num_vertices)
        self._h = self._lib.adj_build(
            _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
            src.shape[0], self.num_vertices)
        if not self._h:
            raise ValueError(
                f"edge ids out of range [0, {num_vertices}) in adjacency "
                f"(corrupted graph data?)")

    def disk_update(self, seed: int, radius: int, mask: np.ndarray) -> int:
        """mask[v] = max(mask[v], radius - hopdist(seed, v)) in place;
        returns how many entries went 0 -> positive.

        NOT thread-safe across calls on one instance: the native handle
        owns shared BFS scratch (frontier/stamp buffers). Use one
        Adjacency per thread for parallel disk generation."""
        # hard checks (not asserts): the raw pointer goes to native code,
        # and a wrong dtype/size under python -O would be an OOB write
        if mask.dtype != np.float32 or not mask.flags.c_contiguous:
            raise ValueError("mask must be C-contiguous float32")
        if mask.shape != (self.num_vertices,):
            raise ValueError(
                f"mask shape {mask.shape} != ({self.num_vertices},)")
        return int(self._lib.adj_disk_update(
            self._h, int(seed), int(radius), _ptr(mask, ctypes.c_float)))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.adj_free(self._h)
            self._h = None


def build_children_table(trace: np.ndarray, num_valid_fine: int,
                         coarse_pad: int, fine_trash: int,
                         max_children: int = 128):
    """Native twin of build.py's `_build_children` (same return contract)."""
    lib = get_lib()
    tr = np.ascontiguousarray(trace[:num_valid_fine], dtype=np.int32)
    children = np.empty((coarse_pad, max(max_children, 1)), np.int32)
    counts = np.empty(coarse_pad, np.float32)
    cmax = int(lib.build_children(
        _ptr(tr, ctypes.c_int32), num_valid_fine, coarse_pad, fine_trash,
        max_children, _ptr(children, ctypes.c_int32),
        _ptr(counts, ctypes.c_float)))
    if cmax < 0:
        raise ValueError(
            f"trace values out of range [0, {coarse_pad}) in native "
            f"children build (corrupted trace data?)")
    if cmax == 0 or cmax > max_children:
        return None, None
    # row stride in the C buffer is cmax: reshape a trimmed copy
    flat = children.reshape(-1)[:coarse_pad * cmax]
    return flat.reshape(coarse_pad, cmax).copy(), counts

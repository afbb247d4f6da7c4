"""Bit-for-bit parity of the native C++ edge-set builder vs the numpy path.

The native builder (graph/native/graph_builder.cpp) must be a drop-in twin
of build.py's `_pad_edge_set` / `_build_children`: every array (sorted+padded
COO, ELL nbr/rev tables, degrees, spill, children) identical, so the
dispatch in build.py can pick either path per-environment.
"""
import os

import numpy as np
import pytest

from stinet_tpu.graph import native
from stinet_tpu.graph import build as B
from stinet_tpu.graph.hierarchy import EdgeSet
from stinet_tpu.utils.synthetic import synthetic_scene

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native builder unavailable (no g++?)")


def _numpy_edge_set(*args, **kw):
    """Run `_pad_edge_set` with the native path forced off."""
    os.environ["STINET_NATIVE_BUILD"] = "0"
    try:
        return B._pad_edge_set(*args, **kw)
    finally:
        os.environ.pop("STINET_NATIVE_BUILD")


def _native_edge_set(*args, **kw):
    assert native.available()
    return B._pad_edge_set(*args, **kw)


def _assert_edge_sets_equal(a: EdgeSet, b: EdgeSet):
    assert (a.nbr is None) == (b.nbr is None)
    assert (a.spill_src is None) == (b.spill_src is None)
    assert a.halo == b.halo
    assert int(a.num_edges) == int(b.num_edges)
    for f in ("src", "dst", "degree", "nbr", "rev_dst", "out_degree",
              "ell_degree", "spill_src", "spill_dst"):
        va, vb = getattr(a, f), getattr(b, f)
        if va is None:
            continue
        assert va.dtype == vb.dtype, f
        assert va.shape == vb.shape, (f, va.shape, vb.shape)
        np.testing.assert_array_equal(va, vb, err_msg=f)


def _edge_cases():
    rng = np.random.default_rng(0)
    cases = []
    # plain mesh-ish graph
    e = synthetic_scene(4096, seed=1).level_edges[0]
    cases.append(("mesh", e, B.bucket_size(e.shape[1]), None))
    # banded (windowed) variant
    cases.append(("mesh_windowed", e, B.bucket_size(e.shape[1]), 64))
    # hub-dominated: one receiver with degree > max_deg, hub senders too
    hub = np.stack([rng.integers(0, 512, 3000),
                    np.full(3000, 7)])
    rest = rng.integers(0, 512, (2, 4000))
    hubs = np.concatenate([hub, rest, np.stack([np.full(900, 3),
                                                rng.integers(0, 512, 900)])],
                          axis=1)
    cases.append(("hubs", hubs, B.bucket_size(hubs.shape[1]), None))
    # tiny graph
    tiny = np.array([[0, 1, 2, 2], [1, 2, 0, 0]])
    cases.append(("tiny", tiny, 128, None))
    # uniform low degree (d_cap >= d_in widen branch)
    ring = np.stack([np.arange(1000), (np.arange(1000) + 1) % 1000])
    cases.append(("ring", ring, 1024, None))
    # windowed with everything out of window (no in-window edges -> no ELL)
    far = np.stack([np.arange(500), (np.arange(500) + 250) % 500])
    cases.append(("far_windowed", far, 512, 8))
    return cases


@pytest.mark.parametrize("name,edges,e_pad,halo",
                         _edge_cases(), ids=lambda c: str(c)[:16])
def test_edge_set_parity(name, edges, e_pad, halo):
    v_pad = B.bucket_size(int(edges.max()) + 2, 128)
    a = _numpy_edge_set(edges, e_pad, v_pad - 1, v_pad, window_halo=halo)
    b = _native_edge_set(edges, e_pad, v_pad - 1, v_pad, window_halo=halo)
    _assert_edge_sets_equal(a, b)


@pytest.mark.parametrize("windowed", [False, True])
@pytest.mark.parametrize("nscenes", [1, 2])
def test_full_graph_parity(windowed, nscenes, monkeypatch):
    """End-to-end: build_hierarchical_graph identical on both paths,
    including multi-scene offset-shifted batching and dilated edge sets.

    The RCM orderings legitimately differ between native and scipy
    (equivalent relabelings, tie-breaks differ) — pin the ordering by
    pre-reordering once and making reorder_bandwidth the identity, so the
    windowed comparison exercises banding/halo/table construction."""
    scenes = [synthetic_scene(3000, seed=s) for s in range(nscenes)]
    if windowed:
        scenes = [B.reorder_bandwidth(s) for s in scenes]
        monkeypatch.setattr(B, "reorder_bandwidth", lambda s: s)
    os.environ["STINET_NATIVE_BUILD"] = "0"
    try:
        g_np = B.build_hierarchical_graph(scenes, windowed=windowed)
    finally:
        os.environ.pop("STINET_NATIVE_BUILD")
    g_nat = B.build_hierarchical_graph(scenes, windowed=windowed)

    import jax
    leaves_a, treedef_a = jax.tree_util.tree_flatten(g_np)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(g_nat)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # non-pytree (static) fields too
    for la, lb in zip(g_np.levels, g_nat.levels):
        assert la.edges.halo == lb.edges.halo
        for d in la.dilated:
            assert la.dilated[d].halo == lb.dilated[d].halo


def test_native_rcm_quality():
    """The native RCM must be a permutation and achieve the same band
    profile as scipy's (identical p99.9 band on the synthetic meshes —
    both implement the classic min-degree-seeded CM; assert within 10% to
    stay robust to tie-break drift)."""
    scipy_csgraph = pytest.importorskip("scipy.sparse.csgraph")
    from scipy.sparse import csr_matrix

    scene = synthetic_scene(4096, seed=2)
    for l, nv in enumerate(scene.num_vertices):
        e = scene.level_edges[l]
        o_nat = native.rcm_order(e, nv)
        assert np.array_equal(np.sort(o_nat), np.arange(nv))
        inv = np.empty(nv, np.int64)
        inv[o_nat.astype(np.int64)] = np.arange(nv)
        band_nat = np.percentile(np.abs(inv[e[0]] - inv[e[1]]), 99.9)
        adj = csr_matrix((np.ones(e.shape[1], np.int8), (e[0], e[1])),
                         shape=(nv, nv))
        o_sp = np.asarray(
            scipy_csgraph.reverse_cuthill_mckee(adj, symmetric_mode=False),
            np.int64)
        inv2 = np.empty(nv, np.int64)
        inv2[o_sp] = np.arange(nv)
        band_sp = np.percentile(np.abs(inv2[e[0]] - inv2[e[1]]), 99.9)
        assert band_nat <= band_sp * 1.1 + 1, (l, band_nat, band_sp)


def test_children_parity():
    rng = np.random.default_rng(3)
    coarse_pad = 256
    trace = rng.integers(0, 200, 2000).astype(np.int32)
    trace = np.concatenate([trace, np.full(48, coarse_pad - 1, np.int32)])
    os.environ["STINET_NATIVE_BUILD"] = "0"
    try:
        ca, cca = B._build_children(trace, 2000, coarse_pad, 999)
    finally:
        os.environ.pop("STINET_NATIVE_BUILD")
    cb, ccb = B._build_children(trace, 2000, coarse_pad, 999)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(cca, ccb)
    assert ca.dtype == cb.dtype and cca.dtype == ccb.dtype


def test_children_overflow_falls_back():
    trace = np.zeros(300, np.int32)  # one cluster of 300 > max_children
    a = B._build_children(trace, 300, 64, 63)
    assert a == (None, None)


def test_threaded_build_parity(monkeypatch):
    """Forced thread-pool fan-out (STINET_BUILD_WORKERS=6) must produce the
    same graph as sequential builds — this host may have 1 CPU (pool never
    engages by default), but multi-core serving hosts take this path."""
    import jax
    scenes = [synthetic_scene(2500, seed=s) for s in range(2)]
    monkeypatch.setenv("STINET_BUILD_WORKERS", "1")
    g_seq = B.build_hierarchical_graph(scenes)
    monkeypatch.setenv("STINET_BUILD_WORKERS", "6")
    g_par = B.build_hierarchical_graph(scenes)
    la, ta = jax.tree_util.tree_flatten(g_seq)
    lb, tb = jax.tree_util.tree_flatten(g_par)
    assert ta == tb
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_out_of_range_ids_raise():
    """Corrupted (out-of-range) edge/trace ids must raise loudly from the
    native paths, never scatter out of bounds or silently degrade."""
    bad = np.array([[0, 5000], [1, 2]])  # src 5000 >= v_pad
    with pytest.raises(ValueError, match="out of range"):
        B._pad_edge_set(bad, 128, 127, 128)
    with pytest.raises(ValueError, match="out of range"):
        native.rcm_order(bad, 128)
    with pytest.raises(ValueError, match="out of range"):
        native.Adjacency(bad, 128)
    with pytest.raises(ValueError, match="out of range"):
        trace = np.array([0, 1, 300], np.int32)  # 300 >= coarse_pad
        native.build_children_table(trace, 3, 256, 255)


def test_fragmented_rcm_is_fast():
    """Many tiny components (isolated vertices) must not trigger the
    O(n * components) seed rescan: 50k singletons in well under a second."""
    import time
    n = 50000
    e = np.array([[0], [1]])  # one edge; the rest isolated
    t0 = time.perf_counter()
    order = native.rcm_order(e, n)
    assert time.perf_counter() - t0 < 1.0
    assert np.array_equal(np.sort(order), np.arange(n))


def test_circle_mask_native_parity():
    """The native bounded-BFS disk path must produce bit-identical masks to
    the scipy dijkstra path: same rng consumption (loop exits after the
    same number of draws) and same hop-distance values."""
    from stinet_tpu.preprocessing.masks import circle_mask, _adjacency

    scene = synthetic_scene(3000, seed=5)
    e, nv = scene.level_edges[0], scene.num_vertices[0]
    for radius, frac, seed in ((4, 0.15, 0), (8, 0.4, 1), (2, 0.05, 2)):
        m_sp = circle_mask(_adjacency(e, nv), nv, radius, frac,
                           np.random.default_rng(seed))
        m_nat = circle_mask(native.Adjacency(e, nv), nv, radius, frac,
                            np.random.default_rng(seed))
        np.testing.assert_array_equal(m_sp, m_nat)
        assert m_nat.dtype == np.float32
        assert (m_nat > 0).mean() >= frac * 0.9


def test_edges_from_faces_native_parity():
    """Native hash-dedup edges_from_faces must match the numpy path
    exactly, including first-occurrence edge ORDER (downstream f32
    summation order depends on it)."""
    from stinet_tpu.preprocessing import graph_levels as GL

    rng = np.random.default_rng(7)
    for nf, nv in ((500, 300), (4000, 2100)):
        faces = rng.integers(0, nv, (nf, 3))
        # inject degenerate faces (self-loop edges must be dropped)
        faces[:: 17, 1] = faces[:: 17, 0]
        os.environ["STINET_NATIVE_BUILD"] = "0"
        try:
            a = GL.edges_from_faces(faces)
        finally:
            os.environ.pop("STINET_NATIVE_BUILD")
        b = GL.edges_from_faces(faces)
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="out of range"):
        native.edges_from_faces(np.array([[0, 1, 99]]), 10)


@pytest.mark.parametrize("seed", range(6))
def test_edge_set_parity_fuzz(seed):
    """Randomized parity sweep across degree styles, halos, quantiles and
    caps — a compact standing version of the review-time fuzz."""
    rng = np.random.default_rng(seed)
    nv = int(rng.integers(50, 2000))
    ne = int(rng.integers(1, 6000))
    style = seed % 3
    if style == 0:        # uniform random
        e = rng.integers(0, nv, (2, ne))
    elif style == 1:      # hub-heavy receivers
        e = np.stack([rng.integers(0, nv, ne),
                      rng.integers(0, max(nv // 50, 1), ne)])
    else:                 # banded
        src = rng.integers(0, nv, ne)
        e = np.stack([src, np.clip(src + rng.integers(-40, 40, ne),
                                   0, nv - 1)])
    v_pad = B.bucket_size(nv + 1, 128)
    e_pad = B.bucket_size(ne, 128)
    halo = [None, 16, 64][int(rng.integers(0, 3))]
    q = float(rng.uniform(0.5, 1.0))
    a = _numpy_edge_set(e, e_pad, v_pad - 1, v_pad,
                        cap_quantile=q, window_halo=halo)
    b = _native_edge_set(e, e_pad, v_pad - 1, v_pad,
                         cap_quantile=q, window_halo=halo)
    _assert_edge_sets_equal(a, b)

"""HierarchicalGraph batching/padding invariants + grid hierarchy parity."""
import numpy as np

from stinet_tpu.graph import (
    build_hierarchical_graph, grid_hierarchy, bucket_size)
from stinet_tpu.graph.build import RawHierarchy, grid_edges, grid_trace


def make_raw(rng, nv=(30, 12, 5), c=4, name="s"):
    levels = len(nv)
    edges = []
    for v in nv:
        e = rng.integers(0, v, size=(2, 4 * v)).astype(np.int64)
        edges.append(e)
    traces = [np.clip(rng.integers(0, nv[l + 1], size=nv[l]), 0,
                      nv[l + 1] - 1).astype(np.int64)
              for l in range(levels - 1)]
    return RawHierarchy(
        x=rng.normal(size=(nv[0], c)).astype(np.float32),
        color=rng.normal(size=(nv[0], 3)).astype(np.float32),
        mask=rng.integers(0, 3, size=(nv[0], 1)).astype(np.float32),
        num_vertices=list(nv), level_edges=edges, traces=traces, name=name)


def test_bucket_size():
    assert bucket_size(1) == 128
    assert bucket_size(128) == 128
    assert bucket_size(129) == 256
    assert bucket_size(300, geometric=True) >= 300


def test_batch_offsets(rng):
    a, b = make_raw(rng, name="a"), make_raw(rng, name="b")
    g = build_hierarchical_graph([a, b])
    assert g.num_graphs == 2
    assert int(g.levels[0].num_vertices) == 60
    # Sample b's vertices are offset by sample a's count at each level.
    lvl0 = g.levels[0]
    gid = np.asarray(lvl0.graph_id)
    assert (gid[:30] == 0).all() and (gid[30:60] == 1).all()
    assert (gid[60:] == 2).all()  # pad rows get id == num_graphs
    # Edges sorted by dst.
    dst = np.asarray(lvl0.edges.dst)
    assert (np.diff(dst) >= 0).all()
    # Valid edge count and trash padding.
    ne = int(lvl0.edges.num_edges)
    assert ne == 2 * 4 * 30
    trash = lvl0.num_padded_vertices - 1
    assert (dst[ne:] == trash).all()
    # Traces of sample b offset by a's coarse count, pads -> coarse trash.
    tr = np.asarray(g.traces[0])
    assert tr[:30].max() < 12
    assert 12 <= tr[30:60].min() and tr[30:60].max() < 24
    assert (tr[60:] == g.levels[1].num_padded_vertices - 1).all()
    # Features padded with zeros.
    assert np.asarray(g.x)[60:].sum() == 0


def test_degree_matches_valid_edges(rng):
    a = make_raw(rng)
    g = build_hierarchical_graph([a])
    lvl = g.levels[0]
    deg = np.asarray(lvl.edges.degree)
    want = np.bincount(a.level_edges[0][1],
                       minlength=lvl.num_padded_vertices)
    np.testing.assert_array_equal(deg, want)


def test_grid_hierarchy_shapes():
    nv, edges, traces = grid_hierarchy(16, 3)
    assert nv == [256, 64, 16]
    # 4-connected directed edges of an n x n grid: 2 * 2 * n * (n-1)
    assert edges[0].shape[1] == 4 * 16 * 15
    assert traces[0].shape == (256,)
    assert traces[0].max() == 63


def test_grid_edges_match_bruteforce():
    n = 5
    got = {tuple(e) for e in grid_edges(n).T}
    want = set()
    for r in range(n):
        for c in range(n):
            i = r * n + c
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < n and 0 <= cc < n:
                    want.add((i, rr * n + cc))
    assert got == want


def test_grid_trace_2x2_replication():
    tr = grid_trace(2).reshape(4, 4)
    want = np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                     [2, 2, 3, 3], [2, 2, 3, 3]])
    np.testing.assert_array_equal(tr, want)


def test_stable_argsort_int_matches_numpy_stable(rng):
    """The composite-key fast path must be a drop-in for
    np.argsort(kind="stable") on non-negative int keys (ELL slot
    assignment depends on stability)."""
    from stinet_tpu.graph.build import _stable_argsort_int
    for n, hi in ((0, 5), (1, 1), (257, 3), (4096, 64), (20000, 65536)):
        keys = rng.integers(0, hi, size=n).astype(np.int64)
        np.testing.assert_array_equal(
            _stable_argsort_int(keys), np.argsort(keys, kind="stable"))
    # int32 input and heavy duplication
    keys = rng.integers(0, 2, size=9999).astype(np.int32)
    np.testing.assert_array_equal(
        _stable_argsort_int(keys), np.argsort(keys, kind="stable"))

"""Host-side (numpy) construction of padded `HierarchicalGraph` pytrees.

This is the boundary between ragged real-world mesh data and the static-shape
device world: graphs are batched by concatenation with vertex-offset shifts
(replacing PyG collation driven by `HierarchicalData.__inc__`,
/root/reference/utils/data_utils.py:29-42), then padded up to bucket shapes so
XLA compiles once per bucket rather than once per scene.
"""
import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from stinet_tpu.graph.hierarchy import EdgeSet, GraphLevel, HierarchicalGraph
from stinet_tpu.graph import native as _native


def bucket_size(n: int, multiple: int = 128, geometric: bool = False,
                ratio: float = 1.25) -> int:
    """Round `n` up to a bucket shape. With `geometric`, buckets grow by
    `ratio` steps (bounded recompilation count over arbitrary scene sizes);
    otherwise round to the next `multiple` (8/128-lane friendly)."""
    n = max(int(n), 1)
    if geometric:
        b = multiple
        while b < n:
            b = int(np.ceil(b * ratio / multiple) * multiple)
        return b
    return int(-(-n // multiple) * multiple)


@dataclasses.dataclass
class RawHierarchy:
    """Ragged, host-side (numpy) view of one multi-level graph sample.

    level_edges[l]: [2, E_l] int (row 0 = src/sender, row 1 = dst/receiver),
    traces[l]: [V_l] -> level l+1 vertex ids (l = 0..L-2),
    dilated[l]: {dist: [2, E]} extra edge sets (usually only coarsest level).
    """
    x: np.ndarray
    color: np.ndarray
    mask: np.ndarray
    num_vertices: List[int]
    level_edges: List[np.ndarray]
    traces: List[np.ndarray]
    dilated: Dict[int, Dict[int, np.ndarray]] = dataclasses.field(
        default_factory=dict)
    labels: Optional[np.ndarray] = None
    name: str = ""
    # vertex ids already bandwidth-ordered (offline RCM pass,
    # preprocessing/graph_levels.py rcm=True): windowed builds skip their
    # per-sample reorder
    banded: bool = False


ELL_MAX_DEGREE = 64


def _stable_argsort_int(keys: np.ndarray) -> np.ndarray:
    """Stable argsort for non-negative int keys, ~3x faster than
    np.argsort(kind="stable") (numpy's int radix sort loses to quicksort on
    a composite key at graph-edge sizes; measured 97 ms vs 32 ms at E=393k).
    Encodes (key, position) into one int64 so the default introsort is
    stable by construction."""
    n = keys.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    comp = keys.astype(np.int64) * n + np.arange(n, dtype=np.int64)
    return np.argsort(comp)


def _build_ell(src, dst, e, v_pad, trash, max_deg=ELL_MAX_DEGREE,
               cap_quantile=0.97, max_spill_frac=0.25, window_halo=None):
    """Hybrid ELL(+spill) tables from the (dst-sorted) valid edges.

    The slot axis is capped near the `cap_quantile` in-degree: receivers with
    more edges keep the first D_cap in ELL and spill the rest to a COO list
    (ops/ell.py docstring). With `window_halo`, edges with |src - dst| >
    window_halo ALSO spill, so the ELL tables are banded and the windowed
    one-hot MXU kernel applies (ops/pallas/onehot_gather.py). Returns a dict
    with nbr / rev_dst / out_degree / ell_degree / spill (or None for
    degenerate distributions)."""
    vs, vd = src[:e].astype(np.int64), dst[:e].astype(np.int64)
    if e == 0:
        return None
    win_ok = (np.abs(vs - vd) <= window_halo if window_halo is not None
              else np.ones(e, bool))
    deg = np.bincount(vd[win_ok], minlength=v_pad)
    d_in = int(deg.max()) if win_ok.any() else 0
    if d_in == 0:
        return None
    nz = deg[deg > 0]
    d_cap = max(int(np.quantile(nz, cap_quantile)), 4)
    d_cap = min(d_cap, d_in, max_deg)
    spill_count = (int(np.maximum(deg - d_cap, 0).sum())
                   + int((~win_ok).sum()))
    if (d_cap >= d_in or spill_count > max_spill_frac * e) \
            and window_halo is None:
        # spilling at the quantile cap is unnecessary or unprofitable:
        # widen to the full degree where it fits under max_deg; if even a
        # max-width table leaves >max_spill_frac of the edges in COO the
        # graph is hub-dominated and pure COO beats a mostly-empty ELL
        d_cap = min(d_in, max_deg)
        if d_cap < d_in:
            spill_at_cap = int(np.maximum(deg - d_cap, 0).sum())
            if spill_at_cap > max_spill_frac * e:
                return None

    # slot = position within the (dst-sorted) run restricted to in-window
    # edges: csum_ok[i] counts in-window edges strictly before i, and
    # run_start_ok[d] is that count at the first edge of d's run
    csum_ok = np.cumsum(win_ok) - win_ok
    run_start_ok = np.zeros(v_pad, np.int64)
    # vd is dst-sorted, so run firsts are just boundaries (np.unique would
    # sort it again — measurable at graph-edge sizes)
    first = np.flatnonzero(np.diff(vd, prepend=vd[0] - 1))
    uniq = vd[first]
    run_start_ok[uniq] = csum_ok[first]
    slot = np.where(win_ok, csum_ok - run_start_ok[vd], d_cap)
    keep = win_ok & (slot < d_cap)

    # Sender-side cap: a few hub SENDERS must not force the whole edge set
    # onto the scatter path (observed: QEM-mesh dil16 tables with max
    # out-degree 83 bailed entirely, costing ~4x on batched dispatch).
    # Edges past a sender's first max_deg kept slots spill to COO; receiver
    # slots re-pack afterwards so the `slot < deg` contiguity the ELL
    # kernels mask by (ops/ell.py:_forward) still holds.
    kidx = np.flatnonzero(keep)
    if len(kidx):
        kvs_k = vs[kidx]
        order_k = _stable_argsort_int(kvs_k)
        od_full = np.bincount(kvs_k, minlength=v_pad)
        indptr_k = np.zeros(v_pad + 1, np.int64)
        np.cumsum(od_full, out=indptr_k[1:])
        rank = np.arange(len(kvs_k)) - indptr_k[kvs_k[order_k]]
        overflow = order_k[rank >= max_deg]
        if len(overflow):
            keep[kidx[overflow]] = False
            csum_k = np.cumsum(keep) - keep
            run_start_k = np.zeros(v_pad, np.int64)
            run_start_k[uniq] = csum_k[first]
            slot = np.where(keep, csum_k - run_start_k[vd], d_cap)

    nbr = np.full((v_pad, d_cap), trash, np.int32)
    nbr[vd[keep], slot[keep]] = vs[keep]
    ell_deg = np.bincount(vd[keep], minlength=v_pad)

    kvs, kvd = vs[keep], vd[keep]
    out_deg = np.bincount(kvs, minlength=v_pad)
    d_out = int(out_deg.max()) if len(kvs) else 1
    order = _stable_argsort_int(kvs)
    indptr_o = np.zeros(v_pad + 1, np.int64)
    np.cumsum(out_deg, out=indptr_o[1:])
    slot_o = np.arange(len(kvs)) - indptr_o[kvs[order]]
    rev_dst = np.full((v_pad, max(d_out, 1)), trash, np.int32)
    rev_dst[kvs[order], slot_o] = kvd[order]

    spill = None
    if (~keep).any():
        s_pad = bucket_size(int((~keep).sum()), 128)
        sp_src = np.full(s_pad, trash, np.int32)
        sp_dst = np.full(s_pad, trash, np.int32)
        n_sp = int((~keep).sum())
        sp_src[:n_sp] = vs[~keep]
        sp_dst[:n_sp] = vd[~keep]   # still sorted by dst
        spill = (sp_src, sp_dst)
    return {"nbr": nbr, "rev_dst": rev_dst,
            "out_degree": out_deg.astype(np.float32),
            "ell_degree": ell_deg.astype(np.float32), "spill": spill}


def _build_children(trace, num_valid_fine, coarse_pad, fine_trash,
                    max_children=128):
    """Children table (coarse vertex -> its valid fine vertices) for
    gather-only pooling. Only valid fine rows contribute (pad rows trace to
    the coarse trash vertex and are excluded). Returns (children [Vc, C],
    counts [Vc]) or (None, None) when a cluster exceeds max_children."""
    if num_valid_fine > 0 and _native.available():
        return _native.build_children_table(
            trace, num_valid_fine, coarse_pad, fine_trash, max_children)
    tv = trace[:num_valid_fine].astype(np.int64)
    counts = np.bincount(tv, minlength=coarse_pad)
    cmax = int(counts.max()) if num_valid_fine else 0
    if cmax == 0 or cmax > max_children:
        return None, None
    order = _stable_argsort_int(tv)
    indptr = np.zeros(coarse_pad + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    slot = np.arange(num_valid_fine) - indptr[tv[order]]
    children = np.full((coarse_pad, cmax), fine_trash, np.int32)
    children[tv[order], slot] = order.astype(np.int32)
    return children, counts.astype(np.float32)


def _pad_edge_set(edges: np.ndarray, e_pad: int, trash: int,
                  v_pad: int, ell_max_degree: int = ELL_MAX_DEGREE,
                  cap_quantile: float = 0.97,
                  window_halo: Optional[int] = None) -> EdgeSet:
    """Sort a [2, E] COO edge array by destination and pad to e_pad with
    trash self-edges. Precomputes the valid in-degree per (padded) vertex
    and, when the degree bound allows, the ELL/reverse fast-path tables
    (banded to `window_halo` when given).

    Dispatches to the native C++ builder (graph/native/graph_builder.cpp, a
    bit-for-bit twin, ~10x faster at ScanNet-scale edge counts) when the
    library is available; ``STINET_NATIVE_BUILD=0`` forces this numpy path.
    """
    src, dst = np.asarray(edges[0]), np.asarray(edges[1])
    assert src.shape[0] <= e_pad, \
        f"edge bucket too small: {src.shape[0]} > {e_pad}"
    if src.shape[0] > 0 and _native.available():
        fields = _native.build_edge_set_tables(
            src, dst, e_pad, trash, v_pad, ell_max_degree, cap_quantile,
            max_spill_frac=0.25, window_halo=window_halo,
            bucket=bucket_size)
        return EdgeSet(**fields)
    order = _stable_argsort_int(dst)
    src, dst = src[order], dst[order]
    e = src.shape[0]
    ell = _build_ell(src, dst, e, v_pad, trash, ell_max_degree,
                     cap_quantile=cap_quantile, window_halo=window_halo)
    pad = e_pad - e  # >= 0: asserted above before the native dispatch
    src = np.concatenate([src, np.full(pad, trash, dtype=np.int64)])
    dst = np.concatenate([dst, np.full(pad, trash, dtype=np.int64)])
    degree = np.bincount(edges[1], minlength=v_pad).astype(np.float32)
    kw = {}
    if ell is not None:
        spill = ell["spill"]
        kw = dict(nbr=ell["nbr"], rev_dst=ell["rev_dst"],
                  out_degree=ell["out_degree"],
                  ell_degree=ell["ell_degree"],
                  spill_src=spill[0] if spill else None,
                  spill_dst=spill[1] if spill else None,
                  halo=window_halo)
    return EdgeSet(src=src.astype(np.int32), dst=dst.astype(np.int32),
                   num_edges=np.int32(e), degree=degree, **kw)


def rcm_perm(edges: np.ndarray, nv: int):
    """Reverse-Cuthill-McKee ordering of one level: returns
    ``(order, inv)`` with ``order[new_id] = old_id`` and
    ``inv[old_id] = new_id``. Native RCM (graph/native) when available;
    the scipy fallback computes the same classic algorithm (tie-breaks
    may differ — both are pure relabelings). Shared by the runtime
    reorder (reorder_bandwidth) and the offline preprocessing pass
    (preprocessing/graph_levels.py) so the two orderings cannot
    silently diverge."""
    if _native.available():
        order = _native.rcm_order(edges, nv).astype(np.int64)
    else:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        ones = np.ones(edges.shape[1], np.int8)
        adj = csr_matrix((ones, (edges[0], edges[1])), shape=(nv, nv))
        order = np.asarray(
            reverse_cuthill_mckee(adj, symmetric_mode=False), np.int64)
    inv = np.empty(nv, np.int64)
    inv[order] = np.arange(nv)
    return order, inv


def reorder_bandwidth(sample: RawHierarchy) -> RawHierarchy:
    """Permute every level's vertices by reverse-Cuthill-McKee so edges
    become banded (|src - dst| small), enabling the windowed one-hot MXU
    aggregation kernel (ops/pallas/onehot_gather.py). Pure relabeling: the
    graph, features, traces and dilated edge sets are equivalent
    (`_auto_halo` re-derives the band from whatever ordering was
    achieved)."""
    perms = []      # perms[l][new_id] = old_id
    newids = []     # newids[l][old_id] = new_id
    for l, nv in enumerate(sample.num_vertices):
        order, inv = rcm_perm(sample.level_edges[l], nv)
        perms.append(order)
        newids.append(inv)

    def remap_edges(e, l):
        return newids[l][np.asarray(e, np.int64)]

    new_traces = [newids[l + 1][sample.traces[l].astype(np.int64)][perms[l]]
                  for l in range(len(sample.traces))]
    new_dilated = {
        l: {d: remap_edges(e, l) for d, e in dists.items()}
        for l, dists in sample.dilated.items()}
    p0 = perms[0]
    return dataclasses.replace(
        sample,
        x=sample.x[p0], color=sample.color[p0], mask=sample.mask[p0],
        labels=sample.labels[p0] if sample.labels is not None else None,
        level_edges=[remap_edges(e, l)
                     for l, e in enumerate(sample.level_edges)],
        traces=new_traces,
        dilated=new_dilated)


# Already-banded detection threshold: skip the RCM reorder when every
# level's band quantile ladders to a halo at or below this (the windowed
# dispatch win region, ops/message_passing.py caps). Scenes stored by the
# offline RCM pass (preprocessing/graph_levels.py rcm=True) land here.
_BANDED_SKIP_HALO = 384


def _is_banded(sample: RawHierarchy, quantile: float) -> bool:
    """True when every level's raw edge band already ladders to a halo
    small enough that reordering would not change the kernel dispatch.

    Only a dispatch heuristic (a wrong True just yields larger halos, a
    wrong False a redundant reorder), so the band quantile runs on a
    strided <=32k-edge subsample — a full-scene scan cost ~10 ms/sample
    on every windowed build of an unbanded scene."""
    for l, nv in enumerate(sample.num_vertices):
        e = sample.level_edges[l]
        ne = e.shape[1]
        if ne == 0:
            continue
        step = max(ne // 32768, 1)
        band = np.abs(e[0, ::step].astype(np.int64)
                      - e[1, ::step].astype(np.int64))
        need = max(int(np.quantile(band, quantile)), 1)
        if need > _BANDED_SKIP_HALO:
            return False
    return True


# Static halo ladder: `halo` is a non-pytree (trace-time) field of EdgeSet,
# so every distinct value compiles a distinct program. Rounding the
# data-dependent band quantile UP onto this bounded ladder keeps the
# compiled-program count bounded over arbitrary scenes (the same contract
# geometric edge bucketing gives the array shapes). Values are chosen so
# the dispatch caps in ops/message_passing.py (384, 2048) are exactly
# representable.
_HALO_LADDER = (32, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)


def _auto_halo(edges: np.ndarray, v_pad: int, quantile: float,
               tile: int = 256, max_window_frac: float = 0.75):
    """Pick the window halo from the achieved band distribution, rounded up
    onto _HALO_LADDER; None when the band exceeds the ladder or the window
    would cover most of the graph (kernel unprofitable)."""
    ne = edges.shape[1]
    if ne == 0:
        return None
    # strided <=64k-edge subsample: the quantile only picks a ladder rung
    # (out-of-band edges spill to COO either way), and the full-scene scan
    # was ~18 ms/build at flagship scale
    step = max(ne // 65536, 1)
    band = np.abs(edges[0, ::step].astype(np.int64)
                  - edges[1, ::step].astype(np.int64))
    need = max(int(np.quantile(band, quantile)), 1)
    halo = next((h for h in _HALO_LADDER if h >= need), None)
    if halo is None or tile + 2 * halo > max_window_frac * v_pad:
        return None
    return halo


def _concat_features(arrs, pad_rows, pad_value=0):
    a = np.concatenate(arrs, axis=0)
    if pad_rows > 0:
        pad_shape = (pad_rows,) + a.shape[1:]
        a = np.concatenate(
            [a, np.full(pad_shape, pad_value, dtype=a.dtype)], axis=0)
    return a


def build_hierarchical_graph(
        samples: Sequence[RawHierarchy],
        v_buckets: Optional[Sequence[int]] = None,
        e_buckets: Optional[Sequence[int]] = None,
        pad_multiple: int = 128,
        geometric: bool = False,
        ell_cap_quantile: float = 0.97,
        windowed: bool = False,
        window_quantile: float = 0.999) -> HierarchicalGraph:
    """Batch + pad raw hierarchies into one static-shape HierarchicalGraph.

    Vertex ids of sample g at level l are shifted by the cumulative vertex
    count of samples 0..g-1 at that level (the `__inc__` contract). Buckets
    default to rounding the batched totals up to `pad_multiple` (+1 row for
    the trash vertex).

    With `windowed`, samples are RCM-reordered (reorder_bandwidth) and each
    edge set's ELL tables are banded to an auto-chosen halo (band quantile;
    out-of-band edges spill to COO), enabling the windowed one-hot MXU
    aggregation kernel on TPU. Samples whose vertex ids are ALREADY banded
    (e.g. preprocessed with the offline RCM pass, graph_levels rcm=True)
    skip the reorder — band-quantile detection per level, threshold at the
    windowed dispatch win region.

    The per-edge-set table builds are independent and run on a thread pool
    (the native builder releases the GIL for the duration of the C call);
    ``STINET_BUILD_WORKERS=1`` forces sequential builds.
    """
    if windowed:
        samples = [s if (s.banded or _is_banded(s, window_quantile))
                   else reorder_bandwidth(s) for s in samples]
    num_levels = len(samples[0].num_vertices)
    num_graphs = len(samples)

    # Per-level vertex offsets for each sample in the batch.
    counts = np.array([[s.num_vertices[l] for s in samples]
                       for l in range(num_levels)])  # [L, G]
    offsets = np.concatenate(
        [np.zeros((num_levels, 1), dtype=np.int64),
         np.cumsum(counts, axis=1)], axis=1)  # [L, G+1]
    totals = offsets[:, -1]

    if v_buckets is None:
        v_buckets = [bucket_size(int(t) + 1, pad_multiple, geometric)
                     for t in totals]
    # Stage 1 (sequential, concat-bound): assemble every edge-set task.
    # tasks[key] = (edges, e_pad, trash, v_pad, halo); key = (level, dist)
    # with dist=None for the level's base edge set.
    tasks = {}
    for l in range(num_levels):
        v_pad = int(v_buckets[l])
        assert v_pad > totals[l], "vertex bucket must exceed valid count"
        trash = v_pad - 1

        edges = np.concatenate(
            [s.level_edges[l] + offsets[l, g]
             for g, s in enumerate(samples)], axis=1)
        e_pad = (int(e_buckets[l]) if e_buckets is not None
                 else bucket_size(edges.shape[1], pad_multiple, geometric))
        halo = (_auto_halo(edges, v_pad, window_quantile)
                if windowed else None)
        tasks[(l, None)] = (edges, e_pad, trash, v_pad, halo)

        all_dists = sorted({d for s in samples for d in s.dilated.get(l, {})})
        for dist in all_dists:
            # a scene missing this distance at this level contributes zero
            # edges (heterogeneous batches: mixed dilation configs or
            # crops whose dilated sets emptied out)
            de = np.concatenate(
                [s.dilated.get(l, {}).get(
                    dist, np.zeros((2, 0), np.int64)) + offsets[l, g]
                 for g, s in enumerate(samples)], axis=1)
            de_pad = bucket_size(de.shape[1], pad_multiple, geometric)
            dhalo = (_auto_halo(de, v_pad, window_quantile)
                     if windowed else None)
            tasks[(l, int(dist))] = (de, de_pad, trash, v_pad, dhalo)

    # Stage 2 (parallel): build the padded tables. Each task is a pure
    # function of its own arrays, so thread timing cannot affect results.
    def _run(t):
        edges, e_pad, trash, v_pad, halo = t
        return _pad_edge_set(edges, e_pad, trash, v_pad,
                             cap_quantile=ell_cap_quantile,
                             window_halo=halo)

    w_env = os.environ.get("STINET_BUILD_WORKERS")
    nw = int(w_env) if w_env else min(len(tasks), os.cpu_count() or 4)
    if nw <= 1 or len(tasks) <= 1:
        built = {k: _run(t) for k, t in tasks.items()}
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=nw) as pool:
            futs = {k: pool.submit(_run, t) for k, t in tasks.items()}
            built = {k: f.result() for k, f in futs.items()}

    # Stage 3 (sequential): assemble levels, traces, children.
    levels = []
    traces = []
    children = []
    for l in range(num_levels):
        v_pad = int(v_buckets[l])
        dil = {d: built[(ll, d)] for (ll, d) in built
               if ll == l and d is not None}

        graph_id = np.full(v_pad, num_graphs, dtype=np.int32)
        for g in range(num_graphs):
            graph_id[offsets[l, g]:offsets[l, g + 1]] = g

        levels.append(GraphLevel(
            edges=built[(l, None)],
            num_vertices=np.int32(totals[l]),
            graph_id=graph_id,
            dilated=dil,
        ))

        if l < num_levels - 1:
            coarse_pad = (int(v_buckets[l + 1]))
            tr = np.full(v_pad, coarse_pad - 1, dtype=np.int32)
            for g, s in enumerate(samples):
                tr[offsets[l, g]:offsets[l, g + 1]] = (
                    s.traces[l].astype(np.int64) + offsets[l + 1, g])
            traces.append(tr)
            children.append(_build_children(
                tr, int(totals[l]), coarse_pad, v_pad - 1))

    pad0 = int(v_buckets[0]) - int(totals[0])
    x = _concat_features([s.x for s in samples], pad0)
    color = _concat_features([s.color for s in samples], pad0)
    mask = _concat_features([s.mask for s in samples], pad0)
    labels = None
    if samples[0].labels is not None:
        labels = _concat_features(
            [s.labels for s in samples], pad0).astype(np.int32)

    ch = tuple(c[0] for c in children)
    cc = tuple(c[1] for c in children)
    return HierarchicalGraph(
        x=x.astype(np.float32), color=color.astype(np.float32),
        mask=mask.astype(np.float32), levels=tuple(levels),
        traces=tuple(traces), num_graphs=num_graphs, labels=labels,
        children=ch, child_counts=cc)


def batch_hierarchies(samples: Sequence[RawHierarchy], **kw):
    return build_hierarchical_graph(samples, **kw)


# ---------------------------------------------------------------------------
# Synthetic grid-graph hierarchy for the 2D image-inpainting workload.
# Semantics follow the reference's fake hierarchy: 4-connected grid edges per
# level and 2x2 nearest-upsample traces with decimation factor 2
# (/root/reference/datasets/imagegraph_dataloader.py:44-108), but built
# vectorized instead of with python loops over pixels.
# ---------------------------------------------------------------------------

def grid_edges(n: int) -> np.ndarray:
    """Directed 4-neighborhood edges of an n x n grid, [2, E] (both
    directions present, no self loops)."""
    idx = np.arange(n * n).reshape(n, n)
    h = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()])   # left->right
    v = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()])   # up->down
    und = np.concatenate([h, v], axis=1)
    return np.concatenate([und, und[::-1]], axis=1)


def grid_trace(coarse_n: int, decimation: int = 2) -> np.ndarray:
    """Fine vertex -> coarse vertex map by 2x2 block replication."""
    tr = np.arange(coarse_n * coarse_n).reshape(coarse_n, coarse_n)
    tr = np.repeat(np.repeat(tr, decimation, axis=1), decimation, axis=0)
    return tr.reshape(-1).astype(np.int64)


_GRID_CACHE: Dict[Tuple[int, int], Tuple[list, list, list]] = {}


def grid_hierarchy(img_size: int, end_level: int, decimation: int = 2):
    """(num_vertices, level_edges, traces) for an image-as-graph hierarchy."""
    key = (img_size, end_level)
    if key not in _GRID_CACHE:
        sizes = [img_size // (decimation ** l) for l in range(end_level)]
        nv = [s * s for s in sizes]
        edges = [grid_edges(s) for s in sizes]
        trs = [grid_trace(sizes[l + 1], decimation)
               for l in range(end_level - 1)]
        _GRID_CACHE[key] = (nv, edges, trs)
    return _GRID_CACHE[key]


# ---------------------------------------------------------------------------
# Stacked batching: each scene as its OWN single-scene padded graph, leaves
# stacked to [B, ...] for a scan-over-scenes step. Gathers never cross scene rows
# (each scanned slice is an independent per-scene table), which sidesteps the
# measured gather-locality cliff of concatenated multi-scene tables
# (BENCH_NOTES batched-serving probe: level-0 aggregate 1.6 ms at 65k rows
# vs 9.0 ms at 4x rows) and gives multi-host data parallelism scene-local
# index semantics by construction. The vertex/edge buckets are forced to a
# common value; the remaining DATA-DEPENDENT table dims (ELL slot width,
# reverse width, spill length, children width, windowed halos) are padded
# up to explicit `widths` so every stacked batch shares one compiled
# signature (trash-filled rows/columns are masked everywhere, so padding is
# semantically inert — same invariants as serving's running-max variant).
# ---------------------------------------------------------------------------

def table_widths(graph: HierarchicalGraph) -> Dict[tuple, int]:
    """Data-dependent table dims of a built graph, keyed by
    (level, dist, field) with dist None for the base edge set; windowed
    halos ride along as (level, dist, "halo"). Merge dicts across graphs /
    hosts with `merge_widths` and apply with `pad_tables_to_widths`."""
    out = {}

    def es_widths(es, li, dk):
        if es is None:
            return
        out[(li, dk, "edges")] = int(es.src.shape[0])
        if es.nbr is not None:
            out[(li, dk, "nbr")] = int(es.nbr.shape[1])
            out[(li, dk, "rev_dst")] = int(es.rev_dst.shape[1])
            out[(li, dk, "spill")] = (0 if es.spill_src is None
                                      else int(es.spill_src.shape[0]))
            if es.halo is not None:
                out[(li, dk, "halo")] = int(es.halo)

    for li, lev in enumerate(graph.levels):
        es_widths(lev.edges, li, None)
        for d, es in lev.dilated.items():
            es_widths(es, li, int(d))
    for l, ch in enumerate(graph.children):
        if ch is not None:
            out[(l, None, "children")] = int(np.asarray(ch).shape[1])
    return out


def merge_widths(dicts) -> Dict[tuple, int]:
    """Key-union max. A graph missing a key another has (ELL bail, missing
    dilation distance) cannot share a stacked signature — caller's treedef
    check raises."""
    merged = {}
    for d in dicts:
        for k, v in d.items():
            merged[k] = max(merged.get(k, 0), int(v))
    return merged


def pad_tables_to_widths(graph: HierarchicalGraph,
                         widths: Dict[tuple, int]) -> HierarchicalGraph:
    """Pad every data-dependent table dim up to `widths` (trash-filled;
    see module comment). Widths smaller than the built dims are ignored
    (padding only grows)."""
    def pad_es(es, li, dk, trash):
        if es is None:
            return es
        upd = {}
        w = widths.get((li, dk, "edges"), 0)
        cur = int(es.src.shape[0])
        if w > cur:
            # trash self-edges at the tail keep dst-sortedness (trash is
            # the max vertex id)
            for f in ("src", "dst"):
                arr = np.asarray(getattr(es, f))
                upd[f] = np.concatenate(
                    [arr, np.full(w - cur, trash, arr.dtype)])
        if es.nbr is not None:
            for f in ("nbr", "rev_dst"):
                arr = np.asarray(getattr(es, f))
                w = widths.get((li, dk, f), 0)
                if w > arr.shape[1]:
                    upd[f] = np.concatenate(
                        [arr, np.full((arr.shape[0], w - arr.shape[1]),
                                      trash, arr.dtype)], axis=1)
            cur = (0 if es.spill_src is None
                   else int(es.spill_src.shape[0]))
            w = widths.get((li, dk, "spill"), 0)
            if w > cur:
                for f, arr in (("spill_src", es.spill_src),
                               ("spill_dst", es.spill_dst)):
                    base = (np.asarray(arr) if arr is not None
                            else np.zeros((0,), np.int32))
                    upd[f] = np.concatenate(
                        [base, np.full(w - cur, trash, np.int32)])
            h = widths.get((li, dk, "halo"))
            if h is not None and es.halo is not None and h > es.halo:
                # a larger halo stays a correct band bound for the
                # windowed kernel's sliding window
                upd["halo"] = h
        return es.replace(**upd) if upd else es

    new_levels = []
    for li, lev in enumerate(graph.levels):
        trash = int(lev.graph_id.shape[0]) - 1
        edges = pad_es(lev.edges, li, None, trash)
        dil = {d: pad_es(es, li, int(d), trash)
               for d, es in lev.dilated.items()}
        new_levels.append(lev.replace(edges=edges, dilated=dil))
    children = []
    for l, ch in enumerate(graph.children):
        if ch is None:
            children.append(ch)
            continue
        arr = np.asarray(ch)
        w = widths.get((l, None, "children"), 0)
        if w > arr.shape[1]:
            fine_trash = int(graph.levels[l].graph_id.shape[0]) - 1
            arr = np.concatenate(
                [arr, np.full((arr.shape[0], w - arr.shape[1]),
                              fine_trash, arr.dtype)], axis=1)
        children.append(arr)
    return graph.replace(levels=tuple(new_levels),
                         children=tuple(children))


def stack_graphs(graphs: Sequence[HierarchicalGraph]) -> HierarchicalGraph:
    """Stack same-signature single-scene graphs to [B, ...] leaves for a
    scanned step. Raises ValueError on treedef/shape mismatch (different
    buckets, ELL/COO layout or dilation sets) — pad_tables_to_widths with
    merged widths first."""
    ref = jax.tree_util.tree_structure(graphs[0])
    for g in graphs[1:]:
        if jax.tree_util.tree_structure(g) != ref:
            raise ValueError(
                "scenes produce different graph treedefs (static halo or "
                "ELL/COO layout mismatch); cannot stack")
    try:
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *graphs)
    except ValueError as e:
        raise ValueError(
            f"scenes land on different table shapes ({e}); force common "
            "v_buckets and pad_tables_to_widths first") from e


def build_stacked_graph(samples: Sequence[RawHierarchy],
                        v_buckets: Optional[Sequence[int]] = None,
                        widths: Optional[Dict[tuple, int]] = None,
                        pad_multiple: int = 128,
                        geometric: bool = False,
                        ell_cap_quantile: float = 0.97,
                        windowed: bool = False,
                        window_quantile: float = 0.999):
    """Build each sample as a single-scene graph at FORCED common vertex
    buckets, pad the data-dependent table dims to a shared signature, and
    stack. Returns (stacked_graph, widths_used). Pass `widths` (e.g. the
    frozen run-wide signature, or a cross-host max) to pin the signature;
    otherwise the batch maxima are used. Builds fan out on a thread pool
    (the native builder releases the GIL)."""
    num_levels = len(samples[0].num_vertices)
    if v_buckets is None:
        v_buckets = [
            max(bucket_size(int(s.num_vertices[l]) + 1, pad_multiple,
                            geometric) for s in samples)
            for l in range(num_levels)]

    # union of dilation distances per level: a crop whose dilated set for
    # some distance emptied out must still build an (empty) edge set, or
    # the per-scene treedefs diverge (the concatenated builder gets this
    # union for free). Frozen runs inherit the union from `widths` keys.
    union_dists = {l: {int(d) for s in samples for d in s.dilated.get(l, {})}
                   for l in range(num_levels)}
    if widths is not None:
        for (li, dk, _f) in widths:
            if dk is not None:
                union_dists.setdefault(li, set()).add(int(dk))
    if any(union_dists[l] for l in union_dists):
        fixed = []
        for s in samples:
            dil = {l: dict(s.dilated.get(l, {})) for l in s.dilated}
            changed = False
            for l, dists in union_dists.items():
                for d in dists:
                    if d not in dil.setdefault(l, {}):
                        dil[l][d] = np.zeros((2, 0), np.int64)
                        changed = True
            fixed.append(dataclasses.replace(s, dilated=dil)
                         if changed else s)
        samples = fixed

    def _one(s):
        return build_hierarchical_graph(
            [s], v_buckets=v_buckets, pad_multiple=pad_multiple,
            geometric=geometric, ell_cap_quantile=ell_cap_quantile,
            windowed=windowed, window_quantile=window_quantile)

    w_env = os.environ.get("STINET_BUILD_WORKERS")
    nw = int(w_env) if w_env else min(len(samples), os.cpu_count() or 4)
    if nw <= 1 or len(samples) <= 1:
        graphs = [_one(s) for s in samples]
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=nw) as pool:
            graphs = list(pool.map(_one, samples))
    batch_w = merge_widths([table_widths(g) for g in graphs])
    if widths is not None:
        over = {k: (batch_w[k], widths.get(k, 0)) for k in batch_w
                if batch_w[k] > widths.get(k, 0)}
        if over:
            raise ValueError(
                f"scene exceeds the frozen stacked signature "
                f"{{key: (built, frozen)}} = {over}. Raise "
                "stacked_width_margin (config) or rebuild the frozen "
                "widths over a larger sample.")
        batch_w = dict(widths)
    graphs = [pad_tables_to_widths(g, batch_w) for g in graphs]
    return stack_graphs(graphs), batch_w


def freeze_stacked_signature(samples: Sequence[RawHierarchy],
                             pad_multiple: int = 128,
                             geometric: bool = False,
                             windowed: bool = False,
                             margin: float = 1.25):
    """One run-wide stacked signature (v_buckets, widths) from
    representative samples: per-level vertex buckets and data-dependent
    table widths are measured by building the samples, then margined by
    `margin` so unsampled scenes fit (a scene that still exceeds the
    frozen signature raises a clear ValueError at build time). A frozen
    signature means ONE compiled step for the whole run — and, multi-host,
    identical leaf shapes on every process with no per-batch collectives
    (each host freezes from the same deterministic sample set; validate
    with parallel/multihost.py:merge_widths_across_hosts)."""
    num_levels = len(samples[0].num_vertices)
    v_buckets = [
        bucket_size(
            int(max(s.num_vertices[l] for s in samples) * margin) + 1,
            pad_multiple, geometric)
        for l in range(num_levels)]
    _, widths = build_stacked_graph(
        samples, v_buckets=v_buckets, pad_multiple=pad_multiple,
        geometric=geometric, windowed=windowed)
    out = {}
    for k, w in widths.items():
        if k[2] == "halo":
            out[k] = w  # band bounds are ladder values; do not inflate
        elif k[2] in ("nbr", "rev_dst", "children"):
            out[k] = int(np.ceil(w * margin))
        else:  # edges / spill lengths: keep lane-friendly multiples
            out[k] = bucket_size(int(w * margin), 128)
    return v_buckets, out

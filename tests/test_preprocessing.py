"""Preprocessing pipeline tests: native decimators, graph level generation,
dilation (vs a literal python port of the reference walk semantics), masks
and crops."""
import os

import numpy as np
import pytest

from stinet_tpu.preprocessing import native
from stinet_tpu.preprocessing.dilation import compute_all_node_dilated_edges
from stinet_tpu.preprocessing.graph_levels import (
    build_scene_levels, edges_from_faces, vertex_normals)
from stinet_tpu.preprocessing.masks import circle_mask
from stinet_tpu.preprocessing.crops import crop_scene
from stinet_tpu.preprocessing.plyio import read_ply, write_ply


def grid_mesh(n=20, noise=0.0, rng=None):
    """Triangulated n x n plane mesh."""
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    v = np.stack([xs.ravel(), ys.ravel(),
                  np.zeros(n * n)], axis=1).astype(np.float64)
    if noise and rng is not None:
        v[:, 2] += rng.normal(scale=noise, size=n * n)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return v, np.asarray(faces, np.int64)


def test_qem_decimate_counts_and_trace(rng):
    v, f = grid_mesh(20, noise=0.01, rng=rng)
    out_v, out_f, trace = native.qem_decimate(v, f, 100)
    assert 80 <= len(out_v) <= 120
    assert trace.shape == (400,)
    # trace surjective onto the output vertex set
    assert set(np.unique(trace)) == set(range(len(out_v)))
    # faces reference valid vertices, non-degenerate
    assert out_f.min() >= 0 and out_f.max() < len(out_v)
    assert ((out_f[:, 0] != out_f[:, 1]) & (out_f[:, 1] != out_f[:, 2])
            & (out_f[:, 0] != out_f[:, 2])).all()
    # geometry preserved: decimated vertices stay near the plane
    assert np.abs(out_v[:, 2]).max() < 0.5
    # each original vertex's representative is nearby (grid is 20x20)
    d = np.linalg.norm(v - out_v[trace], axis=1)
    assert np.median(d) < 3.0


def test_cluster_decimate(rng):
    v, f = grid_mesh(16)
    out_v, out_f, trace = native.cluster_decimate(v, f, 2.0)
    assert len(out_v) == 64  # 16/2 = 8 cells per axis
    assert set(np.unique(trace)) == set(range(len(out_v)))
    # representatives are cell means
    for c in range(len(out_v)):
        members = v[trace == c]
        np.testing.assert_allclose(out_v[c], members.mean(0), atol=1e-9)


def test_edges_from_faces():
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    e = edges_from_faces(faces)
    pairs = {tuple(p) for p in e.T}
    want = {(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2),
            (2, 3), (3, 2), (1, 3), (3, 1)}
    assert pairs == want


def test_vertex_normals_plane():
    v, f = grid_mesh(5)
    n = vertex_normals(v, f)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-9)


def test_build_scene_levels_and_loader_roundtrip(tmp_path, rng):
    v, f = grid_mesh(24, noise=0.01, rng=rng)
    colors = rng.uniform(0, 1, size=(len(v), 3))
    labels = rng.integers(0, 21, size=len(v))
    data = build_scene_levels(v, f, colors, labels,
                              level_params=["100", "30", "30"],
                              dilation_dists=(2, 4),
                              dilation_levels=(2,))
    assert data["num_levels"] == 3
    nv0 = data["vertices_0"].shape[0]
    assert nv0 == len(v)
    nv1 = data["vertices_1"].shape[0]
    nv2 = data["vertices_2"].shape[0]
    assert nv2 < nv1 < nv0
    # traces: level l-1 count rows, values in [0, nv_l)
    assert data["traces_1"].shape == (nv0,)
    assert data["traces_1"].max() < nv1
    assert data["traces_2"].shape == (nv1,)
    assert data["traces_2"].max() < nv2
    assert "dil_2_edges_2" in data
    # vertex layout: pos|color|normals|orig-index
    np.testing.assert_allclose(data["vertices_0"][:, 9],
                               np.arange(nv0), atol=0)

    # write npz + mask, then drive the 3D data loader + STINet forward
    from stinet_tpu.data.scannet import read_split, SCANNET_VAL_FILE
    scene = read_split(SCANNET_VAL_FILE)[0]
    root = tmp_path / "val"
    os.makedirs(root / "graphs")
    np.savez(root / "graphs" / f"{scene}.npz", **data)
    mdir = root / "masks" / "rad_16" / scene
    os.makedirs(mdir)
    mask = np.zeros(nv0, np.float32)
    mask[rng.choice(nv0, nv0 // 5, replace=False)] = 3
    np.savez(mdir / "0.npz", vertex_mask=mask)

    from stinet_tpu.data.scannet import ScanNetGraphColorDataSet
    from stinet_tpu.graph import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    import jax

    ds = ScanNetGraphColorDataSet(str(root), "rad_16", 3, is_train=False)
    assert len(ds) == 1
    sample = ds[0]
    g = build_hierarchical_graph([sample])
    model = define_G(input_nc=10, output_nc=3, ngf=8, n_blocks=2,
                     dilations=[1, 2], norm="instance", pooling_type="max",
                     n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv")
    params = model.init(jax.random.key(0), g)["params"]
    out = np.asarray(model.apply({"params": params}, g))
    assert np.isfinite(out[:nv0]).all()


def test_ply_roundtrip(tmp_path, rng):
    v, f = grid_mesh(6)
    colors = rng.uniform(0, 1, size=(len(v), 3))
    for binary in (True, False):
        p = str(tmp_path / f"mesh_{binary}.ply")
        write_ply(p, v, f, colors, binary=binary)
        m = read_ply(p)
        np.testing.assert_allclose(m["vertices"], v, atol=1e-5)
        np.testing.assert_array_equal(m["faces"], f)
        assert np.abs(m["colors"] - colors).max() < 1.0 / 255 + 1e-6


# ----------------------- dilation parity ----------------------------------

def reference_dilation(edges, pos, norm, dilations):
    """Literal python implementation of the reference walk
    (graph_dilation.py:86-137) used as the oracle."""
    nv = pos.shape[0]
    adj = [[] for _ in range(nv)]
    seen = set()
    for s, d in edges.T:
        if (s, d) not in seen:
            seen.add((s, d))
            adj[s].append(d)

    def proj(n, u):
        return u - n * np.dot(u, n)  # unit normals

    out = {d: set() for d in dilations}
    for c in range(nv):
        one_hop = sorted(adj[c], key=lambda n: np.linalg.norm(pos[n] - pos[c]))
        for n0 in one_hop:
            if n0 == c:
                continue
            last, cur = c, n0
            direction = pos[cur] - pos[last]
            for dil in range(2, max(dilations) + 1):
                best, best_sim = -1, 0.0
                for m in adj[cur]:
                    if m in adj[c] or m == last:
                        continue
                    a = proj(norm[cur], direction)
                    b = proj(norm[cur], pos[m] - pos[cur])
                    na, nb = np.linalg.norm(a), np.linalg.norm(b)
                    if na < 1e-12 or nb < 1e-12:
                        continue
                    sim = np.dot(a, b) / (na * nb)
                    if sim >= best_sim:
                        best_sim, best = sim, m
                if best == -1:
                    break
                if dil in dilations:
                    out[dil].add((best, c))
                last, cur = cur, best
                dnew = proj(norm[cur], direction)
                direction = dnew / np.linalg.norm(dnew)
    return out


def test_dilation_matches_reference_walk(rng):
    # planar triangulated grid with xy jitter: a regular grid has exactly
    # perpendicular candidates (cos sim == +-1e-16 floating noise) where the
    # walk choice is undefined; real meshes are not degenerate like that.
    v, f = grid_mesh(8, noise=0.02, rng=rng)
    v[:, 0:2] += rng.uniform(-0.2, 0.2, size=(len(v), 2))
    edges = edges_from_faces(f)
    norm = np.zeros_like(v)
    norm[:, 2] = 1.0
    dils = [2, 4]
    got = compute_all_node_dilated_edges(edges, v, norm, dils)
    want = reference_dilation(edges, v, norm, dils)
    for d, e in zip(dils, got):
        got_set = {tuple(p) for p in e.T}
        # ties may resolve differently; demand high overlap and identical size
        # scale
        inter = len(got_set & want[d])
        union = len(got_set | want[d])
        assert inter / union > 0.9, (d, inter, union)


def test_dilation_points_toward_center(rng):
    """Dilated edges (m -> c): m should be farther from c than 1-hop."""
    v, f = grid_mesh(10)
    edges = edges_from_faces(f)
    norm = np.zeros_like(v)
    norm[:, 2] = 1.0
    (e2,) = compute_all_node_dilated_edges(edges, v, norm, [2])
    d = np.linalg.norm(v[e2[0]] - v[e2[1]], axis=1)
    # 2-dilated targets lie beyond the 1-hop ring (longest 1-hop edge is the
    # anti-diagonal sqrt(2)); they must never BE 1-hop neighbors
    assert (d >= 1.4).all()
    one_hop = {tuple(p) for p in edges.T}
    assert not ({tuple(p) for p in e2.T} & one_hop)


# ----------------------- masks + crops ------------------------------------

def test_circle_mask_semantics(rng):
    v, f = grid_mesh(12)
    edges = edges_from_faces(f)
    mask = circle_mask(edges, len(v), radius=4, frac_masked=0.1,
                       rng=np.random.default_rng(0))
    assert (mask > 0).sum() >= 0.1 * len(v)
    assert mask.max() <= 4
    # values are radius - hopdist: a masked vertex adjacent to an observed
    # one must have value 1 (the disk boundary)
    from stinet_tpu.preprocessing.masks import bfs_hop_distances
    masked = mask > 0
    boundary = []
    for s, d in edges.T:
        if masked[s] and not masked[d]:
            boundary.append(s)
    assert boundary, "disk has a boundary"
    assert np.allclose(mask[boundary], 1.0)


def test_crop_scene(rng):
    v, f = grid_mesh(24, noise=0.01, rng=rng)
    colors = rng.uniform(0, 1, size=(len(v), 3))
    data = build_scene_levels(v, f, colors, None,
                              level_params=["100", "30", "30"])
    crop = crop_scene(data, np.array([0.0, 0.0]), 12.0, 3,
                      min_coarse_vertices=5)
    assert crop is not None
    nv0 = crop["vertices_0"].shape[0]
    assert 0 < nv0 < len(v)
    # all crop vertices inside AABB
    assert (crop["vertices_0"][:, 0] <= 12.0).all()
    assert (crop["vertices_0"][:, 1] <= 12.0).all()
    # traces valid
    assert crop["traces_0"].shape == (nv0,)
    assert crop["traces_0"].max() < crop["vertices_1"].shape[0]
    assert crop["traces_1"].max() < crop["vertices_2"].shape[0]
    # edges reference crop-local ids
    assert crop["edges_0"].max() < nv0


def test_crop_npz_loads_through_scene_loader(tmp_path, rng):
    """Crop npz files (num_levels-1 traces, no original-mesh trace) load
    through load_scene_npz and assemble into a consistent cropped-style
    RawHierarchy — the no_train_cropped=False training path."""
    from stinet_tpu.data.scannet import load_scene_npz
    from stinet_tpu.graph.build import RawHierarchy, build_hierarchical_graph

    v, f = grid_mesh(40, noise=0.01, rng=rng)
    colors = rng.uniform(0, 1, size=(len(v), 3))
    data = build_scene_levels(v, f, colors, None,
                              level_params=["100", "30", "30"], rcm=True)
    crop = crop_scene(data, np.array([0.0, 0.0]), 30.0, 3,
                      min_coarse_vertices=5)
    path = tmp_path / "scene0000_00_0.npz"
    np.savez(path, **crop)

    vertices, edges, traces, dilated, dists, banded = \
        load_scene_npz(str(path), 3)
    assert banded
    assert len(vertices) == 3 and len(edges) == 3
    # crop convention: num_levels-1 traces, traces[l] maps level l -> l+1
    assert len(traces) == 2
    for l, t in enumerate(traces):
        assert t.shape[0] == vertices[l].shape[0]
        assert t.max() < vertices[l + 1].shape[0]

    v0 = vertices[0].astype(np.float32)
    use_traces = traces[:2]  # cropped: no original-mesh trace to drop
    nvs = [v0.shape[0]] + [int(t.max()) + 1 for t in use_traces]
    sample = RawHierarchy(
        x=v0[:, :10], color=v0[:, 3:6],
        mask=np.zeros((len(v0), 1), np.float32), num_vertices=nvs,
        level_edges=list(edges), traces=list(use_traces),
        dilated=dilated, banded=banded)
    g = build_hierarchical_graph([sample], windowed=True)
    assert g.levels[0].edges.halo is not None


def test_crop_scene_propagates_rcm_flag(rng):
    """Crops of RCM-stored scenes carry rcm_ordered and stay banded (crop
    relabeling preserves relative vertex order)."""
    v, f = grid_mesh(24, noise=0.01, rng=rng)
    data = build_scene_levels(v, f, None, None,
                              level_params=["100", "30", "30"], rcm=True)
    crop = crop_scene(data, np.array([0.0, 0.0]), 12.0, 3,
                      min_coarse_vertices=5)
    assert crop is not None and int(crop["rcm_ordered"]) == 1
    e = crop["edges_0"].astype(np.int64)
    band95 = int(np.quantile(np.abs(e[0] - e[1]), 0.95))
    assert band95 <= 384  # within the windowed-dispatch skip region


def wavy_mesh(n=50, amp=1.5):
    """Smooth curved terrain — a realistic stand-in for a room surface."""
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float64),
                         np.arange(n, dtype=np.float64), indexing="ij")
    z = amp * (np.sin(xs * 0.3) + np.cos(ys * 0.25))
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return v, np.asarray(faces, np.int64)


def _mean_edge_len(v, e):
    return float(np.linalg.norm(v[e[0]] - v[e[1]], axis=1).mean())


def test_qem_full_ladder_statistics():
    """Full reference '100 30 30 30' decimation ladder on a realistic mesh:
    level sizes track the ratio, traces stay surjective, geometric error
    stays small relative to the coarsening, and mean edge length grows
    ~1/sqrt(0.3) per level — the documented behavior of vcglib tridecimator
    -On -C on surface meshes (reference graph_level_generation.py:248-249,
    preprocess_3d_inpainting.sh level params)."""
    v, f = wavy_mesh(50)
    levels = build_scene_levels(v, f, None, None,
                                level_params=["100", "30", "30", "30"])
    sizes = [len(levels[f"vertices_{l}"]) for l in range(4)]
    assert sizes[0] == 2500  # "100" is the identity level
    for l in range(1, 4):
        want = int(sizes[l - 1] * 0.3)
        # QEM stops at the first collapse reaching <= target
        assert want - 2 <= sizes[l] <= int(want * 1.1) + 2, (l, sizes)

    prev_pos = v
    prev_mel = _mean_edge_len(
        v.astype(np.float64), levels["edges_0"])
    for l in range(1, 4):
        verts = levels[f"vertices_{l}"][:, :3].astype(np.float64)
        trace = levels[f"traces_{l}"]
        edges = levels[f"edges_{l}"]
        # surjective trace from the previous level
        assert trace.shape[0] == sizes[l - 1]
        assert set(np.unique(trace)) == set(range(sizes[l]))
        # quadric-error proxy: distance from each previous-level vertex to
        # its representative stays bounded by the current resolution
        mel = _mean_edge_len(verts, edges)
        d = np.linalg.norm(prev_pos - verts[trace], axis=1)
        assert np.median(d) < 1.5 * mel, (l, np.median(d), mel)
        assert np.quantile(d, 0.95) < 4.0 * mel, (l, np.quantile(d, 0.95))
        # optimal-placement quality: representatives stay near the surface
        # (amp*2 bounds the height field; collapses must not fly off)
        assert np.abs(verts[:, 2]).max() < 3.5
        # mean edge length grows like 1/sqrt(keep_ratio) per level
        growth = mel / prev_mel
        assert 1.25 < growth < 2.8, (l, growth)
        # faces stay non-degenerate
        fc = levels.get(f"edges_{l}")
        assert (edges[0] != edges[1]).all()
        prev_pos, prev_mel = verts, mel


def test_qem_flip_guard_terminates_under_pressure(rng):
    """Aggressive decimation of a noisy mesh exercises the flip-guard retry
    path; the loop must terminate (bounded cost growth) and still emit a
    valid surjective trace."""
    v, f = grid_mesh(25, noise=0.35, rng=rng)
    out_v, out_f, trace = native.qem_decimate(v, f, 12)
    assert 4 <= len(out_v) <= 40
    assert set(np.unique(trace)) == set(range(len(out_v)))


def test_rasterizer_occlusion_and_observers_mask(rng):
    """Observers-mode masks: a front plane occludes half of a back plane;
    occluded vertices are masked, directly-seen ones are not."""
    from stinet_tpu.preprocessing.masks import (
        pose_visibility, observers_mask)

    # back plane z=5 spanning x,y in [-2, 2] (10x10 grid)
    n = 10
    xs, ys = np.meshgrid(np.linspace(-2, 2, n), np.linspace(-2, 2, n),
                         indexing="ij")
    back_v = np.stack([xs.ravel(), ys.ravel(), np.full(n * n, 5.0)], 1)
    back_f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            back_f += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    # front occluder at z=2.5 covering the x<0 half of the view frustum
    occ_v = np.array([[-2.0, -2.0, 2.5], [0.0, -2.0, 2.5],
                      [0.0, 2.0, 2.5], [-2.0, 2.0, 2.5]])
    occ_f = [[0, 1, 2], [0, 2, 3]]
    v = np.concatenate([back_v, occ_v])
    f = np.asarray(back_f + [[i + n * n for i in t] for t in occ_f],
                   np.int64)

    w, h = 160, 160
    K = (60.0, 60.0, w / 2, h / 2)
    cam = np.eye(4)  # camera at origin looking +z
    vis = pose_visibility(v, f, cam, K, w, h)
    back_vis = vis[:n * n]
    back_x = back_v[:, 0]
    # strictly occluded region (margin for pixel quantization at the edge)
    assert not back_vis[back_x < -0.2].any()
    assert back_vis[back_x > 0.2].all()
    assert vis[n * n:].all()  # occluder itself fully visible

    # second camera far to the +x side sees the occluded half
    cam2 = np.eye(4)
    cam2[:3, 3] = [1.5, 0.0, 0.0]  # shift view left in camera frame
    mask = observers_mask(v, f, [cam, cam2], K, w, h, min_views=2,
                          pose_fraction=1.0, rng=rng)
    # occluded-for-both region stays masked under min_views=2...
    assert mask[:n * n][back_x < -0.2].all()
    # ...and only the region seen by BOTH cameras is unmasked: from cam2 at
    # world x=-1.5, the occluder edge (x=0, z=2.5) shadows back-plane x<1.5
    assert (mask[:n * n][back_x > 1.7] == 0).all()
    # cam1-only region (seen once < min_views=2) is masked
    assert mask[:n * n][(back_x > 0.2) & (back_x < 1.3)].all()


def test_offline_rcm_relabel_equivalence():
    """rcm=True stores a pure relabeling: same geometry, same connectivity
    (as position pairs), consistent traces, re-stamped index channel, and
    banded enough that windowed builds skip their per-sample reorder."""
    from stinet_tpu.utils.hostile import terrain_mesh
    from stinet_tpu.preprocessing.graph_levels import build_scene_levels
    from stinet_tpu.graph import build as B

    v, f = terrain_mesh(4000, seed=3)
    plain = build_scene_levels(v, f, None, None, ["100", "30", "30"],
                               dilation_dists=[2, 4], dilation_levels=[2])
    rcm = build_scene_levels(v, f, None, None, ["100", "30", "30"],
                             dilation_dists=[2, 4], dilation_levels=[2],
                             rcm=True)
    for l in range(3):
        vp, vr = plain[f"vertices_{l}"], rcm[f"vertices_{l}"]
        assert vp.shape == vr.shape
        # index channel re-stamped to new ids
        np.testing.assert_array_equal(vr[:, 9], np.arange(len(vr)))
        # same vertex set (rows are a permutation, ignoring channel 9)
        key = lambda a: np.lexsort(a[:, :9].T[::-1])
        np.testing.assert_allclose(vp[key(vp), :9], vr[key(vr), :9])
        # same edges as geometric endpoint pairs
        def edge_keys(verts, edges):
            p = verts[:, 0:3]
            pairs = np.concatenate([p[edges[0]], p[edges[1]]], axis=1)
            return pairs[np.lexsort(pairs.T[::-1])]
        np.testing.assert_allclose(edge_keys(vp, plain[f"edges_{l}"]),
                                   edge_keys(vr, rcm[f"edges_{l}"]))
        # traces target the same geometric coarse vertex
        if l >= 1:
            fine_p = plain[f"vertices_{l-1}"][:, 0:3]
            fine_r = rcm[f"vertices_{l-1}"][:, 0:3]
            tgt_p = plain[f"vertices_{l}"][plain[f"traces_{l}"], 0:3]
            tgt_r = rcm[f"vertices_{l}"][rcm[f"traces_{l}"], 0:3]
            op, orr = (np.lexsort(fine_p.T[::-1]), np.lexsort(fine_r.T[::-1]))
            np.testing.assert_allclose(tgt_p[op], tgt_r[orr])

    # banded: windowed build must not need reorder_bandwidth
    from stinet_tpu.data.scannet import load_scene_npz
    import io as _io
    buf = {k: rcm[k] for k in rcm}
    import tempfile, os as _os
    d = tempfile.mkdtemp()
    np.savez(_os.path.join(d, "s.npz"), **buf)
    vertices, edges, traces, dilated, dists, banded = load_scene_npz(
        _os.path.join(d, "s.npz"), 3)
    assert banded
    from stinet_tpu.graph.build import RawHierarchy
    v0 = vertices[0].astype(np.float32)
    nvs = [v0.shape[0]] + [int(t.max()) + 1 for t in traces[1:3]]
    sample = RawHierarchy(
        x=v0[:, :10], color=v0[:, 3:6], mask=np.zeros((len(v0), 1), np.float32),
        num_vertices=nvs, level_edges=list(edges), traces=list(traces[1:3]),
        dilated=dilated, banded=banded)
    import pytest as _pytest
    def _boom(s):
        raise AssertionError("reorder should have been skipped")
    orig = B.reorder_bandwidth
    B.reorder_bandwidth = _boom
    try:
        g = B.build_hierarchical_graph([sample], windowed=True)
    finally:
        B.reorder_bandwidth = orig
    assert g.levels[0].edges.halo is not None


def test_native_decimator_robustness():
    """Native decimator hardening: corrupt face ids fail loudly (they
    index C++ vectors in-process), isolated vertices trace to their exact
    nearest survivor (reference csv2npy BallTree semantics), and the
    flip-guard retry penalty cannot diverge on negative QEM costs."""
    from stinet_tpu.preprocessing import native
    from stinet_tpu.utils.hostile import terrain_mesh

    v, f = terrain_mesh(1500, seed=2)
    bad = f.copy()
    bad[0, 0] = 10 ** 6
    import pytest as _pytest
    with _pytest.raises(ValueError, match="out of range"):
        native.qem_decimate(v, bad, 400)
    with _pytest.raises(ValueError, match="out of range"):
        native.cluster_decimate(v, bad, 2.0)

    # isolated vertices (no faces reference them): nearest-survivor trace
    v3 = np.vstack([v, [[500.0, 500.0, 500.0]],
                    [v[0] + np.array([0.01, 0.0, 0.0])]])
    ov, of, tr = native.qem_decimate(v3, f, 400)
    for idx in (-2, -1):
        d_all = np.linalg.norm(ov - v3[idx], axis=1)
        got = np.linalg.norm(ov[tr[idx]] - v3[idx])
        np.testing.assert_allclose(got, d_all.min(), rtol=0, atol=1e-9)

    # decimate terminates on meshes that exercise the flip guard heavily
    # (aggressive target on an irregular surface) — bounded retries even
    # when float cancellation produces tiny negative costs
    ov2, of2, tr2 = native.qem_decimate(v, f, 40)
    assert len(ov2) <= 64 and tr2.max() < len(ov2)

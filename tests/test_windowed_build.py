"""Bandwidth-ordered (windowed) graph building + end-to-end dispatch of the
windowed one-hot MXU kernel through the full STINet (interpret mode on CPU).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stinet_tpu.graph.build import (  # noqa: E402
    build_hierarchical_graph, reorder_bandwidth)
from stinet_tpu.utils.synthetic import synthetic_scene  # noqa: E402


def _scene(v=2048):
    return synthetic_scene(num_vertices=v, levels=3, seed=0,
                           dilation_dists=(2, 4))


def test_reorder_bandwidth_preserves_graph():
    s = _scene()
    r = reorder_bandwidth(s)
    # same degree sequences per level (relabeling invariant)
    for l in range(len(s.num_vertices)):
        d0 = np.sort(np.bincount(s.level_edges[l][1],
                                 minlength=s.num_vertices[l]))
        d1 = np.sort(np.bincount(r.level_edges[l][1],
                                 minlength=r.num_vertices[l]))
        np.testing.assert_array_equal(d0, d1)
    # bandwidth shrinks on the finest level
    b0 = np.abs(s.level_edges[0][0] - s.level_edges[0][1]).max()
    b1 = np.abs(r.level_edges[0][0] - r.level_edges[0][1]).max()
    assert b1 <= b0
    # feature rows follow their vertices: multiset of x rows is unchanged
    assert np.isclose(np.sort(s.x.sum(1)), np.sort(r.x.sum(1))).all()
    # traces stay surjective onto the coarse level
    for l in range(len(r.traces)):
        assert set(r.traces[l].tolist()) == set(
            range(r.num_vertices[l + 1]))


@pytest.mark.parametrize("nf,nc", [
    (1684, 787), (1388, 692), (2416, 1185),  # sizes where the old greedy
    # patch overwrote sole preimages / collided on donors
    (1388, 1388), (100, 9),
])
def test_grid_block_trace_surjective(nf, nc):
    from stinet_tpu.utils.synthetic import grid_block_trace
    t = grid_block_trace(nf, nc)
    counts = np.bincount(t, minlength=nc)
    assert (counts > 0).all(), f"{(counts == 0).sum()} coarse cells orphaned"
    assert t.min() >= 0 and t.max() < nc


def test_windowed_build_bands_ell_tables():
    g = build_hierarchical_graph([_scene()], windowed=True)
    for l, lev in enumerate(g.levels):
        e = lev.edges
        if e.nbr is None or e.halo is None:
            continue
        v_pad = e.nbr.shape[0]
        nbr = np.asarray(e.nbr)
        deg = np.asarray(e.ell_degree).astype(np.int64)
        rows = np.arange(v_pad)[:, None]
        valid = np.arange(nbr.shape[1])[None, :] < deg[:, None]
        band = np.abs(nbr.astype(np.int64) - rows)
        assert (band[valid] <= e.halo).all(), (l, band[valid].max(), e.halo)
        # spilled edges + ELL degrees account for every valid edge
        n_spill = 0 if e.spill_dst is None else int(
            (np.asarray(e.spill_dst) != v_pad - 1).sum())
        assert deg.sum() + n_spill == int(e.num_edges)


def test_scene_loader_windowed_knob():
    """The production loader path ("windowed_graphs" config key ->
    _SceneLoader(windowed=True)) must emit graphs with banded (halo'd)
    ELL tables on bandable meshes."""
    from stinet_tpu.data.scannet import _SceneLoader

    scenes = [_scene(v=1024)]
    loader = _SceneLoader(scenes, batch_size=1, shuffle=False,
                          pad_multiple=128, windowed=True)
    g, names = next(iter(loader))
    assert any(lev.edges.halo is not None for lev in g.levels)
    plain = _SceneLoader(scenes, batch_size=1, shuffle=False,
                         pad_multiple=128)
    g2, _ = next(iter(plain))
    assert all(lev.edges.halo is None for lev in g2.levels)


def test_full_model_windowed_f32_bit_exact(monkeypatch):
    """f32 model on a windowed graph (H=256 levels dispatch the bf16x3
    exact kernel) vs the same graph with halos stripped: outputs must be
    BIT-IDENTICAL — the f32 kernel is exact, unlike the bf16 one whose
    cast tie-breaking the test below tolerates."""
    monkeypatch.setenv("STINET_WINDOWED_INTERPRET", "1")
    import dataclasses

    from stinet_tpu.models.factory import define_G

    scene = _scene()
    g_win = build_hierarchical_graph([scene], windowed=True)

    def strip(es):
        return dataclasses.replace(es, halo=None) if es is not None else es

    levels = tuple(dataclasses.replace(
        lev, edges=strip(lev.edges),
        dilated={d: strip(e) for d, e in lev.dilated.items()})
        for lev in g_win.levels)
    g_nohalo = dataclasses.replace(g_win, levels=levels)

    from stinet_tpu.ops.message_passing import _windowed_kernel_applies
    assert any(
        e.nbr is not None and _windowed_kernel_applies(
            jnp.zeros((e.nbr.shape[0], 256), jnp.float32), e.halo)
        for e in (lev.edges for lev in g_win.levels)), \
        "no level dispatches the f32 kernel — test is vacuous"

    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=2,
                     dilations=[1, 2], norm="instance", pooling_type="max",
                     n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv")
    params = jax.jit(model.init)(jax.random.key(0), g_nohalo)["params"]
    a = np.asarray(model.apply({"params": params}, g_win))
    b = np.asarray(model.apply({"params": params}, g_nohalo))
    nv = int(scene.num_vertices[0])
    np.testing.assert_array_equal(a[:nv], b[:nv])


def test_full_model_windowed_matches_gather_path_bf16(monkeypatch):
    """Same windowed graph run twice — once with halos (windowed one-hot
    kernel dispatched) and once with halos stripped (XLA gather path on the
    IDENTICAL ELL tables): isolates the kernel's numerics from graph
    rebuild effects (slot assignment / spill / summation order)."""
    monkeypatch.setenv("STINET_WINDOWED_INTERPRET", "1")
    import dataclasses

    from stinet_tpu.models.factory import define_G

    scene = _scene()
    g_win = build_hierarchical_graph([scene], windowed=True)
    assert any(lev.edges.halo is not None for lev in g_win.levels)

    def strip(es):
        return dataclasses.replace(es, halo=None) if es is not None else es

    levels = tuple(dataclasses.replace(
        lev, edges=strip(lev.edges),
        dilated={d: strip(e) for d, e in lev.dilated.items()})
        for lev in g_win.levels)
    g_nohalo = dataclasses.replace(g_win, levels=levels)

    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=2,
                     dilations=[1, 2], norm="instance", pooling_type="max",
                     n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv", dtype="bfloat16")
    params = jax.jit(model.init)(jax.random.key(0), g_win)["params"]

    out_kernel = np.asarray(model.apply({"params": params}, g_win),
                            np.float32)
    out_gather = np.asarray(model.apply({"params": params}, g_nohalo),
                            np.float32)
    nv = int(scene.num_vertices[0])
    # residual divergence is 1-ulp f32->bf16 TIE-BREAKING: sums of few bf16
    # terms often land exactly halfway between bf16 neighbors, and the
    # kernel's final cast may break the tie differently than XLA's (such
    # ties cover ~10% of elements: adding same-magnitude bf16 terms makes
    # exact halfway sums common; op-level rel-RMS is ~0.2%). The instance
    # norms globally couple vertices, so the e2e divergence sits at ~3%
    # rel-RMS — below the bf16-vs-f32 model divergence itself
    a, b = out_kernel[:nv], out_gather[:nv]
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=1e-1)
    rel_rms = np.sqrt(((a - b) ** 2).mean()) / np.sqrt((b ** 2).mean())
    assert rel_rms < 0.05, rel_rms

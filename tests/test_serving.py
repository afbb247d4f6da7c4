"""SceneInpainter serving wrapper: parity with direct apply, batched
dispatch slicing, bucket-ladder compile stability, checkpoint restore and
StableHLO export roundtrip (stinet_tpu/serving.py)."""
import numpy as np
import pytest

import jax

from stinet_tpu.graph.build import build_hierarchical_graph
from stinet_tpu.models.factory import define_G
from stinet_tpu.serving import SceneInpainter
from stinet_tpu.utils.synthetic import synthetic_scene


def _tiny_model():
    return define_G(input_nc=10, output_nc=3, ngf=8, n_blocks=2,
                    dilations=[1, 1], norm="instance", pooling_type="max",
                    n_levels=2, n_repeated_io_convs=1,
                    filter_type="edgeconvtransinv", dtype="float32")


@pytest.fixture(scope="module")
def served():
    model = _tiny_model()
    scene = synthetic_scene(num_vertices=500, levels=3, seed=0)
    graph = build_hierarchical_graph([scene])
    params = jax.jit(model.init)(jax.random.key(0), graph)["params"]
    return model, params, scene


def test_predict_matches_direct_apply(served):
    model, params, scene = served
    server = SceneInpainter(model, params)
    got = server.predict(scene)
    graph = build_hierarchical_graph([scene], geometric=True)
    want = np.asarray(model.apply({"params": params}, graph))
    n = scene.num_vertices[0]
    assert got.shape == (n, 3)
    np.testing.assert_allclose(got, want[:n], rtol=1e-5, atol=1e-6)


def test_predict_batch_slices_per_scene(served):
    model, params, scene = served
    server = SceneInpainter(model, params)
    scenes = [scene, synthetic_scene(num_vertices=500, levels=3, seed=1)]
    singles = [server.predict(s) for s in scenes]
    batched = server.predict_batch(scenes)
    assert len(batched) == 2
    for got, want, s in zip(batched, singles, scenes):
        assert got.shape == (s.num_vertices[0], 3)
        # norms are per-graph, so concat-batched output matches the
        # single-scene dispatch up to f32 reduction-order noise
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_predict_batch_stacked_matches_concat(served):
    """The vmapped stacked layout and the concatenated layout are two
    dispatches of the same math: per-scene outputs must agree (norms are
    per-graph in both layouts)."""
    model, params, scene = served
    server = SceneInpainter(model, params)
    scenes = [scene, synthetic_scene(num_vertices=500, levels=3, seed=4)]
    stacked = server.predict_batch(scenes, stacked=True)
    concat = server.predict_batch(scenes, stacked=False)
    for got, want in zip(stacked, concat):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_predict_batch_auto_falls_back_on_bucket_mismatch(served):
    """Scenes on different vertex buckets can't share a stacked signature:
    stacked=True raises, "auto" silently serves them concatenated."""
    model, params, scene = served
    server = SceneInpainter(model, params)
    big = synthetic_scene(num_vertices=2500, levels=3, seed=5)
    with pytest.raises(ValueError):
        server.predict_batch([scene, big], stacked=True)
    outs = server.predict_batch([scene, big], stacked="auto")
    singles = [server.predict(s) for s in (scene, big)]
    for got, want in zip(outs, singles):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stacked_batch_single_compile_for_same_bucket(served):
    """Same-bucket stacked batches converge onto one vmapped compilation:
    the running-max width ladder may grow on early batches, but once every
    scene's widths have been seen, repeat traffic hits the jit cache."""
    model, params, _ = served
    server = SceneInpainter(model, params)
    mk = lambda seed: synthetic_scene(num_vertices=500, levels=3, seed=seed)
    server.predict_batch([mk(6), mk(7)], stacked=True)
    server.predict_batch([mk(8), mk(9)], stacked=True)
    n0 = server.num_compiles()
    server.predict_batch([mk(7), mk(9)], stacked=True)
    assert server.num_compiles() == n0


def test_unify_static_halos_takes_batch_max():
    """Static halos are unified to the BATCH max (one treedef for
    stacking) — and only per batch, never ratcheted into server state
    (a permanently grown halo would push later scenes past the windowed
    dispatch caps)."""
    from stinet_tpu.serving import _unify_static_halos
    scene = synthetic_scene(num_vertices=500, levels=3, seed=10)
    ga = build_hierarchical_graph([scene], windowed=True)
    h0 = ga.levels[0].edges.halo
    assert h0 is not None
    # simulate a narrower-band same-bucket scene: same tables, smaller
    # declared halo (the unified max restores a valid bound)
    lv0 = ga.levels[0]
    gb = ga.replace(levels=(
        lv0.replace(edges=lv0.edges.replace(halo=max(h0 // 2, 1))),
        *ga.levels[1:]))
    out = _unify_static_halos([ga, gb])
    assert out[0].levels[0].edges.halo == h0
    assert out[1].levels[0].edges.halo == h0
    assert (jax.tree_util.tree_structure(out[0])
            == jax.tree_util.tree_structure(out[1]))


def test_windowed_stacked_batch_matches_singles(monkeypatch):
    """Windowed stacked batching end-to-end: per-batch halo unification
    must produce one treedef and unchanged values vs single-scene
    dispatch (halo is a band BOUND; larger stays correct)."""
    monkeypatch.setenv("STINET_WINDOWED_INTERPRET", "1")
    model = _tiny_model()
    scenes = [synthetic_scene(num_vertices=500, levels=3, seed=s)
              for s in (10, 11)]
    graph = build_hierarchical_graph([scenes[0]], windowed=True)
    params = jax.jit(model.init)(jax.random.key(0), graph)["params"]
    server = SceneInpainter(model, params, windowed=True)
    singles = [server.predict(s) for s in scenes]
    batched = server.predict_batch(scenes, stacked=True)
    for got, want in zip(batched, singles):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_predict_stream_matches_predict_in_order(served):
    """Threaded build pipelining must not change values or order."""
    model, params, _ = served
    server = SceneInpainter(model, params)
    scenes = [synthetic_scene(num_vertices=500, levels=3, seed=s)
              for s in (20, 21, 22, 23, 24)]
    want = [SceneInpainter(model, params).predict(s) for s in scenes]
    got = list(server.predict_stream(iter(scenes), build_workers=3))
    assert len(got) == len(scenes)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
    # the per-phase attribution (bench.py stream stage detail) must cover
    # every scene and carry the wire size
    stats = server.stream_stats()
    assert set(stats) == {"build_ms", "pack_ms", "wire_mbytes", "put_ms",
                          "dispatch_ms", "d2h_wait_ms"}
    assert stats["wire_mbytes"] > 0
    assert len(server._stream_stats["build_ms"]) == len(scenes)


def test_mesh_data_parallel_stacked_serving(served):
    """Stacked batches shard one+ scene per device over a mesh's data
    axis (embarrassingly parallel — no collectives) and must match the
    single-device server, including non-divisible B (padded by repeating
    the last scene, padding outputs dropped)."""
    from stinet_tpu.parallel.mesh import make_mesh
    model, params, scene = served
    mesh = make_mesh(4)
    server = SceneInpainter(model, params, mesh=mesh)
    single = SceneInpainter(model, params)
    scenes = [scene] + [synthetic_scene(num_vertices=500, levels=3, seed=s)
                        for s in (30, 31)]   # B=3 on a 4-device axis
    got = server.predict_batch(scenes, stacked=True)
    want = [single.predict(s) for s in scenes]
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)
    # single-scene predict on a mesh server stays correct (replicated)
    np.testing.assert_allclose(server.predict(scene), want[0],
                               rtol=1e-4, atol=1e-4)


def test_predict_partitioned_matches_single_device(served):
    """Full-scene halo-partitioned serving across the mesh must match the
    single-device forward in the scene's original vertex order."""
    from stinet_tpu.parallel.mesh import make_mesh
    model, params, scene = served
    server = SceneInpainter(model, params, mesh=make_mesh(4))
    got = server.predict_partitioned(scene)
    want = SceneInpainter(model, params).predict(scene)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError):
        SceneInpainter(model, params).predict_partitioned(scene)


def test_export_from_mesh_server_is_single_device(served, tmp_path):
    """jax.export bakes the participating device count into the artifact;
    an export from a mesh server must stay callable in a single-device
    context (the fix re-places params/inputs without the mesh)."""
    from stinet_tpu.parallel.mesh import make_mesh
    from stinet_tpu.utils.model_io import load_serving
    model, params, scene = served
    server = SceneInpainter(model, params, mesh=make_mesh(4))
    path = server.export(scene, str(tmp_path / "fwd_mesh.stablehlo"))
    fn = load_serving(path)
    graph = jax.device_put(server._normalize_widths(
        build_hierarchical_graph([scene], pad_multiple=server.pad_multiple,
                                 geometric=server.geometric)))
    out = fn(graph)
    got = np.asarray(out[0] if isinstance(out, (list, tuple)) else out)
    n = scene.num_vertices[0]
    np.testing.assert_allclose(got[:n], server.predict(scene),
                               rtol=1e-4, atol=1e-4)


def test_bucket_ladder_reuses_compilation(served):
    """Running-max width normalization: compiles while table widths grow,
    then plateaus — post-warmup traffic hits the jit cache."""
    model, params, _ = served
    server = SceneInpainter(model, params)
    a = synthetic_scene(num_vertices=500, levels=3, seed=2)
    b = synthetic_scene(num_vertices=500, levels=3, seed=3)
    server.warmup([a, b])
    n0 = server.num_compiles()
    outs = [server.predict(a), server.predict(b)]
    assert server.num_compiles() == n0, \
        "post-warmup same-bucket scenes should hit the jit cache"
    # width padding must not change values: compare against a fresh
    # un-normalized server
    fresh = SceneInpainter(model, params)
    np.testing.assert_allclose(outs[1], fresh.predict(b),
                               rtol=1e-5, atol=1e-6)


def test_from_checkpoint_roundtrip(served, tmp_path):
    model, params, scene = served
    from stinet_tpu.core.checkpoint import save_checkpoint
    ckpt = tmp_path / "model_best.ckpt"
    config = {"archs": {"graph": {"type": "define_G", "args": dict(
        input_nc=10, output_nc=3, ngf=8, n_blocks=2, dilations=[1, 1],
        norm="instance", pooling_type="max", n_levels=2,
        n_repeated_io_convs=1, filter_type="edgeconvtransinv",
        dtype="float32")}}}
    save_checkpoint(ckpt, models={"graph": params},
                    opt_states={"graph": {}}, epoch=3, monitor_best=0.5,
                    config=config, archs={"graph": "STINet"})
    server = SceneInpainter.from_checkpoint(ckpt, scene)
    direct = SceneInpainter(model, params)
    np.testing.assert_allclose(server.predict(scene),
                               direct.predict(scene), rtol=1e-6)


def test_export_roundtrip(served, tmp_path):
    model, params, scene = served
    from stinet_tpu.utils.model_io import load_serving
    server = SceneInpainter(model, params)
    path = server.export(scene, str(tmp_path / "fwd.stablehlo"))
    fn = load_serving(path)
    graph = server._build([scene])
    got = np.asarray(fn(graph)[0] if isinstance(fn(graph), (list, tuple))
                     else fn(graph))
    n = scene.num_vertices[0]
    np.testing.assert_allclose(got[:n], server.predict(scene),
                               rtol=1e-5, atol=1e-6)


def test_predict_batch_heterogeneous_dilated_falls_back(served):
    """Scenes with DIFFERENT dilation-distance sets (mixed preprocessing
    configs, or crops whose dilated sets emptied out) can't share a
    stacked treedef: auto falls back to the concatenated layout, where a
    scene missing a distance contributes zero edges."""
    model, params, scene = served
    server = SceneInpainter(model, params)
    other = synthetic_scene(num_vertices=500, levels=3, seed=9,
                            dilation_dists=(2, 4))  # scene has (2,4,8,16)
    singles = [server.predict(s) for s in (scene, other)]
    batched = server.predict_batch([scene, other])  # must not raise
    assert len(batched) == 2
    for got, want in zip(batched, singles):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_warmup_covers_stacked_single_and_dedupes(served):
    """warmup(b=1) must compile BOTH the single-graph forward and the
    stacked vmapped signature predict_batch uses, and repeated same-bucket
    scenes must not grow the compile count."""
    model, params, scene = served
    server = SceneInpainter(model, params)
    scenes = [synthetic_scene(num_vertices=500, levels=3, seed=s)
              for s in range(4)]
    server.warmup(scenes, batch_sizes=(1,))
    n = server.num_compiles()
    assert n >= 2  # _fwd + _vfwd at the shared bucket
    out = server.predict_batch([scenes[0]])  # stacked auto, B=1
    assert server.num_compiles() == n  # no compile inside the request
    np.testing.assert_allclose(
        out[0], server.predict(scenes[0]), rtol=1e-4, atol=1e-4)

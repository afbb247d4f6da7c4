"""Graph metrics vs torch oracles of the reference formulas; 3D transform
semantics (column ranges, rotation orthonormality, self-loops)."""
import jax.numpy as jnp
import numpy as np
import torch

from stinet_tpu.graph.build import _pad_edge_set, RawHierarchy
from stinet_tpu.metrics import graph_metrics as gm
from stinet_tpu.data import transforms as T


def make_edges(rng, v, e):
    src = rng.integers(0, v, size=e)
    dst = rng.integers(0, v, size=e)
    return src, dst


def test_psnr_matches_reference_formula(rng):
    v = 200
    x = rng.uniform(-1, 1, size=(v, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(v, 3)).astype(np.float32)
    # reference: -10 log10(mean(((x-y)/range)^2) + 1e-8)
    want = -10 * np.log10(np.mean(((x - y) / 2.0) ** 2) + 1e-8)
    got = float(gm.psnr(jnp.asarray(x), jnp.asarray(y), jnp.ones(v),
                        data_range=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_graph_tv_matches_reference(rng):
    v, e = 100, 400
    x = rng.uniform(-1, 1, size=(v, 3)).astype(np.float32)
    src, dst = make_edges(rng, v - 1, e)
    es = _pad_edge_set(np.stack([src, dst]), 512, v - 1, v)
    # reference: sum |x[src] - x[dst]| / (N * C) over edges
    want = np.abs(x[src] - x[dst]).sum() / (v * 3)
    got = float(gm.graph_total_variation(jnp.asarray(x), es, jnp.int32(v)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_laplace_variance_matches_reference(rng):
    v_pad, e = 80, 300
    valid = v_pad - 1  # last row is the trash/pad vertex
    x = rng.uniform(-1, 1, size=(v_pad, 3)).astype(np.float32)
    src, dst = make_edges(rng, valid, e)
    es = _pad_edge_set(np.stack([src, dst]), 384, v_pad - 1, v_pad)
    # reference: var (biased) over vertices of Laplacian of luma
    gray = 0.299 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2]
    lap = np.zeros(valid)
    deg = np.zeros(valid)
    for s, d in zip(src, dst):
        lap[d] += gray[s]
        deg[d] += 1
    lap -= deg * gray[:valid]
    want = lap.var()
    got = float(gm.graph_laplace_variance(jnp.asarray(x), es,
                                          jnp.int32(valid)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def _sample(rng, v=40):
    x = np.zeros((v, 10), np.float32)
    x[:, :3] = rng.uniform(0, 1, (v, 3))
    x[:, 3:6] = rng.normal(size=(v, 3))
    x[:, 6:9] = rng.normal(size=(v, 3))
    edges = rng.integers(0, v, size=(2, 100))
    return RawHierarchy(
        x=x, color=x[:, :3].copy(), mask=np.zeros((v, 1), np.float32),
        num_vertices=[v], level_edges=[edges], traces=[], name="t")


def test_random_rotation_columns(rng):
    s = _sample(rng)
    colors = s.x[:, :3].copy()
    normals = s.x[:, 3:6].copy()
    pos = s.x[:, 6:9].copy()
    out = T.RandomRotation()(s, np.random.default_rng(0))
    np.testing.assert_array_equal(out.x[:, :3], colors)  # colors untouched
    # norms preserved by rotation on 3:6 and 6:9
    np.testing.assert_allclose(np.linalg.norm(out.x[:, 3:6], axis=1),
                               np.linalg.norm(normals, axis=1), rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out.x[:, 6:9], axis=1),
                               np.linalg.norm(pos, axis=1), rtol=1e-5)
    # z component unchanged (rotation about the height axis)
    np.testing.assert_allclose(out.x[:, 8], pos[:, 2], rtol=1e-6)


def test_coords_normalization(rng):
    s = _sample(rng)
    pos = s.x[:, 6:9].copy()
    out = T.CoordsNormalization([2.0, 2.0, 2.0])(s)
    np.testing.assert_allclose(out.x[:, 6:9], pos / 2.0, rtol=1e-6)


def test_add_self_loops(rng):
    s = _sample(rng)
    v = s.num_vertices[0]
    out = T.AddSelfLoops()(s)
    e = out.level_edges[0]
    pairs = {tuple(p) for p in e.T}
    for i in range(v):
        assert (i, i) in pairs
    # no duplicated self loops
    assert (e[0] == e[1]).sum() == v


def test_random_linear_transformation_flip(rng):
    s = _sample(rng)
    pos = s.x[:, 6:9].copy()
    out = T.RandomLinearTransformation(flip=True, pertubation_factor=0.0)(
        s, np.random.default_rng(0))
    np.testing.assert_allclose(out.x[:, 6], -pos[:, 0], rtol=1e-6)
    np.testing.assert_allclose(out.x[:, 7:9], pos[:, 1:3], rtol=1e-6)

def test_edge_metrics_ell_matches_coo(rng):
    """graph_tv_and_lap_var's ELL fast path (shared slot-gather pass +
    spill) must agree with the COO formulation on a spill-heavy edge set,
    including adversarial (non-zero) pad-row contents."""
    v_pad, e = 96, 400
    valid = v_pad - 1
    x = rng.uniform(-1, 1, size=(v_pad, 3)).astype(np.float32)  # pads random
    src, dst = make_edges(rng, valid, e)
    # hub vertex: degree far past the ELL cap quantile -> forced COO spill
    hub = np.stack([rng.integers(0, valid, size=48),
                    np.zeros(48, dtype=np.int64)])
    edges = np.concatenate([np.stack([src, dst]), hub], axis=1)
    es = _pad_edge_set(edges, 512, v_pad - 1, v_pad)
    assert es.nbr is not None, "test must exercise the ELL fast path"
    assert es.spill_src is not None and int(
        (es.spill_dst < valid).sum()) > 0, "test must exercise spill"
    coo = es.replace(nbr=None)

    xj, nv = jnp.asarray(x), jnp.int32(valid)
    tv_ell, lap_ell = gm.graph_tv_and_lap_var(xj, es, nv)
    tv_coo = gm.graph_total_variation(xj, coo, nv)
    lap_coo = gm.graph_laplace_variance(xj, coo, nv)
    np.testing.assert_allclose(float(tv_ell), float(tv_coo), rtol=1e-5)
    np.testing.assert_allclose(float(lap_ell), float(lap_coo), rtol=1e-4)
    # the single-metric entry points dispatch to the same fused path
    np.testing.assert_allclose(
        float(gm.graph_total_variation(xj, es, nv)), float(tv_ell), rtol=0)
    np.testing.assert_allclose(
        float(gm.graph_laplace_variance(xj, es, nv)), float(lap_ell),
        rtol=0)

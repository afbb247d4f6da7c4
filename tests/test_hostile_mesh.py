"""Hostile-mesh coverage (VERDICT r2 item 3): scenes produced by the repo's
OWN native QEM pipeline (utils/hostile.py) — irregular valences, shuffled
ids, real decimator connectivity — must (a) stay within the static RCM halo
ladder so the windowed build does not silently fall back, and (b) produce
bit-consistent windowed-kernel results vs the unrolled ELL path."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stinet_tpu.graph.build import build_hierarchical_graph  # noqa: E402
from stinet_tpu.utils.hostile import hostile_scene  # noqa: E402


@pytest.fixture(scope="module", params=["sphere", "terrain"])
def scene(request):
    return hostile_scene(num_vertices=4096, kind=request.param, seed=0,
                         dilation_dists=(2, 4))


def test_hostile_scene_is_actually_hostile(scene):
    """Degree skew and id shuffle: the generator must not quietly emit a
    friendly regular mesh."""
    e = scene.level_edges[0]
    deg = np.bincount(e[1], minlength=scene.num_vertices[0])
    assert deg.max() >= 9, deg.max()          # valence skew (grid: ~6 flat)
    assert deg.min() >= 1                      # manifold, no orphans
    band = np.abs(e[0] - e[1]).max()
    assert band > scene.num_vertices[0] // 4   # ids not pre-banded

    # traces surjective onto every coarse level (QEM bookkeeping intact)
    for l, t in enumerate(scene.traces):
        assert set(np.unique(t)) == set(range(scene.num_vertices[l + 1])), l


@pytest.mark.parametrize("kind", ["sphere", "terrain"])
def test_hostile_rcm_band_fits_static_halo_ladder(kind):
    """The regression VERDICT asked for: RCM bandwidth on QEM-decimated
    irregular surfaces stays within the static halo ladder
    (graph/build.py::_HALO_LADDER) at every level of a realistic-size
    scene — windowed builds must produce halo'd tables, not the silent
    halo=None fallback. (Tiny levels where the window would cover the
    whole padded range fall back BY DESIGN — build.py::_auto_halo's
    max_window_frac — hence the 16k scene here, whose coarsest level is
    still ~1.5k rows.)"""
    scene = hostile_scene(num_vertices=16384, kind=kind, seed=0,
                          dilation_dists=(2, 4))
    g = build_hierarchical_graph([scene], windowed=True)
    for l, lev in enumerate(g.levels):
        e = lev.edges
        assert e.nbr is not None, f"level {l} lost its ELL tables"
        assert e.halo is not None, (
            f"level {l}: windowed build fell back (band exceeds ladder)")
        # banding invariant actually holds on valid slots
        nbr = np.asarray(e.nbr)
        deg = np.asarray(e.ell_degree if e.ell_degree is not None
                         else e.degree).astype(int)
        rows = np.arange(nbr.shape[0])[:, None]
        valid = np.arange(nbr.shape[1])[None, :] < deg[:, None]
        assert (np.abs(nbr - rows)[valid] <= e.halo).all(), l


def test_hostile_windowed_matches_ell(scene):
    """Windowed one-hot kernel (interpret mode) vs unrolled ELL on hostile
    connectivity. The exact-f32 bf16x3-plane variant is BIT-IDENTICAL to
    the ELL path by contract (test_onehot_gather.py::
    test_windowed_f32_bit_exact_vs_xla_ell); that exactness must not
    depend on friendly banding. (The plain bf16 kernel genuinely rounds
    p+q to bf16 while XLA keeps excess precision on CPU, so only the f32
    variant supports an equality assertion.)"""
    from stinet_tpu.ops.ell import ell_edge_conv_sum
    from stinet_tpu.ops.pallas.onehot_gather import (
        windowed_ell_edge_conv_sum_f32)

    g = build_hierarchical_graph([scene], windowed=True)
    e = g.levels[0].edges
    v_pad = g.levels[0].vertex_mask().shape[0]
    rng = np.random.default_rng(1)
    h = 128
    p = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
    deg = e.ell_degree if e.ell_degree is not None else e.degree
    want = np.asarray(ell_edge_conv_sum(p, q, e.nbr, e.rev_dst, deg,
                                        e.out_degree))
    tile = 256 if v_pad % 256 == 0 else 128
    got = np.asarray(
        windowed_ell_edge_conv_sum_f32(e.halo, tile, True, p, q, e.nbr,
                                       e.rev_dst, deg, e.out_degree))
    np.testing.assert_array_equal(got, want)

"""bf16 compute mode: runs, stays finite, and predictions stay close enough
to f32 that PSNR-style metrics are meaningful (f32 accumulators guard the
reductions)."""
import jax
import jax.numpy as jnp
import numpy as np

from stinet_tpu.graph import build_hierarchical_graph, grid_hierarchy
from stinet_tpu.graph.build import RawHierarchy
from stinet_tpu.models.factory import define_G


def make_sample(rng, img=16, levels=3):
    nv, edges, traces = grid_hierarchy(img, levels)
    return RawHierarchy(
        x=rng.normal(size=(nv[0], 4)).astype(np.float32),
        color=rng.uniform(-1, 1, size=(nv[0], 3)).astype(np.float32),
        mask=np.zeros((nv[0], 1), np.float32),
        num_vertices=list(nv), level_edges=list(edges),
        traces=list(traces), name="s")


def test_bf16_close_to_f32(rng):
    g = build_hierarchical_graph([make_sample(rng)])
    kw = dict(input_nc=4, output_nc=3, ngf=8, n_blocks=2, dilations=[1, 1],
              norm="instance", pooling_type="max", n_levels=2,
              n_repeated_io_convs=1, filter_type="edgeconv")
    m32 = define_G(**kw)
    m16 = define_G(**kw, dtype="bfloat16")
    params = m32.init(jax.random.key(0), g)["params"]
    o32 = np.asarray(m32.apply({"params": params}, g))
    o16 = np.asarray(m16.apply({"params": params}, g)).astype(np.float32)
    assert o16.dtype == np.float32
    n = int(g.levels[0].num_vertices)
    d = np.abs(o32[:n] - o16[:n])
    assert np.isfinite(o16).all()
    # tanh outputs in [-1,1]: bf16 keeps ~2-3 significant digits through the
    # net; with f32 accumulators the drift stays small
    assert d.mean() < 0.03 and d.max() < 0.3, (d.mean(), d.max())


def test_bf16_grads_finite(rng):
    g = build_hierarchical_graph([make_sample(rng)])
    model = define_G(input_nc=4, output_nc=3, ngf=8, n_blocks=2,
                     dilations=[1, 1], norm="instance", pooling_type="max",
                     n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconv", dtype="bfloat16")
    params = model.init(jax.random.key(0), g)["params"]

    def loss(p):
        out = model.apply({"params": p}, g)
        return jnp.mean((out.astype(jnp.float32) - g.color) ** 2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
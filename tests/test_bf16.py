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

def test_bf16_training_tracks_f32(rng):
    """bf16 train step (f32 params/optimizer/accumulators, bf16 compute):
    loss trajectory tracks the f32 run (VERDICT r1 item 4 — bf16 training
    enabled)."""
    import optax
    from stinet_tpu.trainers.graph_common import (
        build_optimizer, make_inpainting_steps, TrainState)

    sample = make_sample(rng)
    n_masked = sample.x.shape[0] // 3
    sample.mask[rng.choice(sample.x.shape[0], n_masked, replace=False), 0] \
        = rng.integers(1, 8, size=n_masked)
    g = build_hierarchical_graph([sample])
    kw = dict(input_nc=4, output_nc=3, ngf=8, n_blocks=2, dilations=[1, 1],
              norm="instance", pooling_type="max", n_levels=2,
              n_repeated_io_convs=1, filter_type="edgeconvtransinv")
    tx, lr = build_optimizer({"type": "Adam",
                              "args": {"lr": 3e-3, "amsgrad": True}})

    losses = {}
    for tag, dtype in (("f32", None), ("bf16", "bfloat16")):
        model = define_G(**kw, dtype=dtype)
        params = model.init(jax.random.key(1), g)["params"]
        # params must stay f32 regardless of compute dtype
        for leaf in jax.tree.leaves(params):
            assert leaf.dtype == jnp.float32
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        train_step, _ = make_inpainting_steps(model, tx,
                                              use_mask_weighted=False)
        traj = []
        for _ in range(12):
            state, metrics = train_step(state, g, jnp.float32(lr))
            traj.append(float(metrics["loss"]))
        losses[tag] = np.asarray(traj)
        assert np.isfinite(losses[tag]).all(), (tag, traj)

    # both must actually train (loss decreases)...
    assert losses["f32"][-1] < losses["f32"][0]
    assert losses["bf16"][-1] < losses["bf16"][0]
    # ...and track each other closely step for step
    rel = np.abs(losses["bf16"] - losses["f32"]) / losses["f32"]
    assert rel.max() < 0.08, (rel.max(), losses)

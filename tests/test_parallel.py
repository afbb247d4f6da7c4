"""Multi-chip sharded training step on the virtual 8-device CPU mesh:
dp-only and dp x tp layouts must both run and match the single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stinet_tpu.graph import build_hierarchical_graph
from stinet_tpu.models.factory import define_G
from stinet_tpu.parallel.data_parallel import make_sharded_train_step
from stinet_tpu.parallel.mesh import make_mesh, graph_sharding, param_sharding
from stinet_tpu.trainers.graph_common import build_optimizer
from stinet_tpu.utils.synthetic import synthetic_scene


def setup_graph(num_vertices=1024, pad_multiple=1024):
    scene = synthetic_scene(num_vertices=num_vertices, levels=3, seed=0,
                            dilation_dists=(2,))
    return build_hierarchical_graph([scene], pad_multiple=pad_multiple)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step(model_parallel):
    n = jax.device_count()
    if n < 2 * model_parallel:
        pytest.skip("not enough devices")
    graph = setup_graph()
    model = define_G(input_nc=10, output_nc=3, ngf=16, n_blocks=2,
                     dilations=[1, 2], norm="instance", pooling_type="max",
                     n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv")
    params = model.init(jax.random.key(0), graph)["params"]
    tx, lr = build_optimizer({"type": "Adam",
                              "args": {"lr": 1e-3, "amsgrad": True}})
    opt_state = tx.init(params)

    # single-device reference step FIRST: the sharded step donates its
    # arguments, and device_put may alias buffers on the virtual CPU mesh
    import optax
    from stinet_tpu.trainers.graph_common import inpainting_loss

    def loss_fn(p):
        out = model.apply({"params": p}, graph, train=True)
        vmask = graph.levels[0].vertex_mask()
        loss, _ = inpainting_loss(out, graph.color, graph.mask, vmask, True)
        return loss

    loss_single, grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(n, model_parallel=model_parallel)
    _, place_state, place_graph, jit_step = make_sharded_train_step(
        model, tx, mesh, use_mask_weighted=True)
    sp, so, _, _ = place_state(jax.tree.map(jnp.copy, params),
                               jax.tree.map(jnp.copy, opt_state))
    sg = place_graph(graph)
    step = jit_step(sp, so)
    new_params, new_opt, metrics = step(sp, so, sg, jnp.float32(lr))
    loss_sharded = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss_sharded)
    np.testing.assert_allclose(loss_sharded, float(loss_single),
                               rtol=1e-5, atol=1e-6)
    # updated params match a single-device optimizer step
    upd, _ = tx.update(grads, tx.init(params), params)
    upd = jax.tree.map(lambda u: u * lr, upd)
    want = optax.apply_updates(params, upd)
    # adam at step 1 normalizes by sqrt(g^2): near-zero gradient elements
    # flip sign under different cross-shard reduction orders, giving O(lr)
    # deltas on isolated elements — tolerate that
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2.5e-3)


def test_param_sharding_layout():
    mesh = make_mesh(8, model_parallel=2)
    params = {"wide": jnp.zeros((64, 256)), "narrow": jnp.zeros((64, 2)),
              "bias": jnp.zeros((256,))}
    specs = param_sharding(params, mesh)
    assert "model" in str(specs["wide"].spec)
    assert specs["narrow"].spec == jax.sharding.PartitionSpec()
    assert specs["bias"].spec == jax.sharding.PartitionSpec()
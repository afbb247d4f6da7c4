"""Sharded training step: jit over a Mesh with explicit in/out shardings.

GSPMD propagates the graph's `data` sharding through gathers/segment ops
(inserting all-reduces where edges cross shard boundaries) and the params'
`model` sharding through the dense projections; the gradient reduction is the
usual automatic psum. One function covers dp (data axis), tp (model axis) and
their product; pipeline/expert axes do not apply to this model family (no
layer pipelining need at this scale, no MoE)."""
import jax
import optax

from stinet_tpu.parallel.mesh import graph_sharding, param_sharding
from stinet_tpu.trainers.graph_common import (
    inpainting_loss, inpainting_metrics)


def make_sharded_train_step(model, tx, mesh, use_mask_weighted=False):
    """Returns (train_step, place_state, place_graph) where train_step is
    jitted with explicit shardings over `mesh`."""

    def train_step(params, opt_state, graph, lr):
        vmask = graph.levels[0].vertex_mask()

        def loss_fn(p):
            out = model.apply({"params": p}, graph, train=True)
            loss, composite = inpainting_loss(
                out, graph.color, graph.mask, vmask, use_mask_weighted)
            return loss, composite

        (loss, composite), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, inpainting_metrics(composite, graph, loss)

    def place_state(params, opt_state):
        pspec = param_sharding(params, mesh)
        params = jax.device_put(params, pspec)
        ospec = jax.tree.map(
            lambda leaf: param_sharding({"x": leaf}, mesh)["x"]
            if hasattr(leaf, "ndim") else None, opt_state)
        opt_state = jax.device_put(opt_state, ospec)
        return params, opt_state, pspec, ospec

    def place_graph(graph):
        return jax.device_put(graph, graph_sharding(graph, mesh))

    def jit_step(params, opt_state):
        pspec = param_sharding(params, mesh)
        ospec = jax.tree.map(
            lambda leaf: param_sharding({"x": leaf}, mesh)["x"]
            if hasattr(leaf, "ndim") else None, opt_state)
        return jax.jit(
            train_step,
            in_shardings=(pspec, ospec, None, None),
            out_shardings=(pspec, ospec, None),
            donate_argnums=(0, 1))

    return train_step, place_state, place_graph, jit_step

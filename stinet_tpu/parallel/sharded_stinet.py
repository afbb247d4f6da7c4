"""Full STINet under graph-partition (halo) parallelism.

Runs the ENTIRE flagship forward inside one `shard_map` region over the
`data` mesh axis, consuming the partitioned layout built by
`stinet_tpu.graph.partition`:

  * dense projections (P/Q, lin2, shortcut, head) — local matmuls on each
    shard's [vp, C] slice (pure data parallelism over the vertex dim, MXU);
  * EdgeConv aggregation — PIPELINED ring halo exchange (one single-hop
    `ppermute` of one filtered buffer per hop — per-hop ICI volume
    constant in the partition count; stinet_tpu/parallel/halo.py)
    followed by the SAME `edge_conv_aggregate` dispatch as the single-chip
    model (ops/message_passing.py): the halo exchange is a standalone
    differentiable op (gather transposes to a boundary-only scatter-add,
    ppermute to its inverse permutation) composed with the gather-only ELL
    custom VJP, so bf16 compute, the STINET_ELL_MODE compile-size knobs and
    any future kernel change apply to the multi-chip path automatically;
  * pooling / unpooling — exactly local by construction (ownership is
    propagated down the hierarchy at build time), using the gather-only
    children-table ops from stinet_tpu/ops/ell.py;
  * instance norm — masked sums `psum`ed over the mesh axis.

Consumes the SAME flax parameter tree as the single-device
`models/stinet.py` model (names `input_block_0/first_filter/lin1_kernel`,
...), so one checkpoint serves both paths; `tests/test_sharded_stinet.py`
asserts fwd+bwd equality against the single-device model on an 8-device CPU
mesh. Reference scaling gap this replaces: single-GPU assert at
/root/reference/trainers/inpainting3d_trainer.py:25 + offline cropping.
"""
import functools

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stinet_tpu.graph.partition import PartitionedGraph, PartEdges
from stinet_tpu.ops.ell import ell_pool_mean, ell_pool_max, ell_unpool
from stinet_tpu.ops.message_passing import edge_conv_aggregate


from stinet_tpu.parallel.halo import halo_exchange as _halo_exchange


def _edge_conv_halo(p_loc, q_loc, edges: PartEdges, n_parts, axis):
    """mean_{j in N(i)} relu(P[i] + Q[j]) with remote senders via halo,
    routed through the single-chip kernel dispatch (edge_conv_aggregate)
    on the extended (local + halo) sender space. The ELL custom VJP
    already supports ragged p/q (dq is shaped from q), so the reverse
    tables over the extended space slot straight in.

    `halo` stays None: the windowed one-hot kernel's bandedness premise
    |nbr[v,d] - v| <= halo does not hold on the extended layout (halo rows
    are appended after the local range), so windowed dispatch is correctly
    bypassed here."""
    assert edges.rev_idx is not None, (
        "partitioned builds always carry reverse tables (graph/partition.py"
        "::_part_edges); legacy PartEdges without them are not supported")
    send_loc = edges.send_idx[0]  # shard_map slices [n_parts, S, H] -> [1, S, H]
    q_ext = _halo_exchange(q_loc, send_loc, n_parts, axis)
    return edge_conv_aggregate(
        p_loc, q_ext, None, None, p_loc.shape[0], aggr="mean",
        degree=edges.degree.astype(p_loc.dtype), nbr=edges.nbr_halo,
        rev_dst=edges.rev_idx, out_degree=edges.rev_deg)


def _instance_norm_psum(x, vmask, axis, eps=1e-5):
    """masked_instance_norm (ops/norms.py) with the vertex dim sharded:
    single-graph statistics psum over the mesh axis."""
    w = vmask[:, None]
    n = jax.lax.psum(jnp.sum(w), axis)
    mean = jax.lax.psum(jnp.sum(x * w, axis=0), axis) / jnp.maximum(n, 1.0)
    centered = (x - mean) * w
    var = jax.lax.psum(jnp.sum(centered * centered, axis=0), axis) \
        / jnp.maximum(n, 1.0)
    return centered * (var + eps) ** -0.5


def _dense(x, kp, dt):
    """flax Dense(dtype=dt) semantics: inputs, kernel and bias promoted to
    the compute dtype before the matmul (models/stinet.py Dense calls)."""
    out = x.astype(dt) @ kp["kernel"].astype(dt)
    if "bias" in kp:
        out = out + kp["bias"].astype(dt)
    return out


def _resnet_block(x, bp, edges: PartEdges, vmask, trans_inv, dt, n_parts,
                  axis):
    """GraphResnetBlock (models/stinet.py:207-229) on partitioned data.
    `dt` is the compute dtype (model.dtype or the stream dtype), applied
    exactly where the flax modules apply it: filter matmuls + lin2 +
    shortcut compute in `dt`; norm statistics in f32, result cast back;
    the residual adds the UNCAST input when no shortcut exists (same
    promotion behavior as the single-device block)."""
    dt = dt or x.dtype
    ff = bp["first_filter"]
    w1 = ff["lin1_kernel"].astype(dt)
    b1 = ff["lin1_bias"].astype(dt)
    x_dt = x.astype(dt)
    if trans_inv:
        xw = x_dt @ w1
        p, q = b1 - xw, xw
    else:
        c = x.shape[1]
        wi, wd = w1[:c], w1[c:]
        p = x_dt @ (wi - wd) + b1
        q = x_dt @ wd
    agg = _edge_conv_halo(p, q, edges, n_parts, axis)
    out = _dense(agg, ff["lin2"], dt)
    in_dtype = out.dtype
    out = _instance_norm_psum(out.astype(jnp.float32), vmask,
                              axis).astype(in_dtype)
    out = jax.nn.elu(out)
    if "shortcut" in bp:
        x = _dense(x, bp["shortcut"], dt)
    return x + out


def _forward_local(params, g: PartitionedGraph, *, n_parts, axis,
                   filter_type, pooling_type, n_blocks, n_levels,
                   n_repeated_io_convs, dilations, dtype=None, remat=True):
    """The STINet forward (models/stinet.py:266-347) on one shard.
    `dtype` is the model's compute dtype (None = stream dtype, f32
    flagship; jnp.bfloat16 for the bf16 production config)."""
    assert filter_type in ("edgeconv", "edgeconvtransinv"), filter_type
    block = _resnet_block
    if remat:
        block = jax.checkpoint(_resnet_block, static_argnums=(4, 5, 6, 7))

    out = g.x
    for i in range(n_repeated_io_convs):
        trans_inv = (i == 0 and filter_type == "edgeconvtransinv")
        out = block(out, params[f"input_block_{i}"], g.levels[0].edges,
                    g.levels[0].vmask, trans_inv, dtype, n_parts, axis)

    pool = ell_pool_mean if pooling_type == "mean" else ell_pool_max
    for i in range(n_levels):
        out = pool(out, g.traces[i], g.children[i], g.child_counts[i])
        out = block(out, params[f"encoder_block_{i}"],
                    g.levels[i + 1].edges, g.levels[i + 1].vmask,
                    False, dtype, n_parts, axis)

    coarse = g.levels[n_levels]
    for i in range(n_blocks):
        d = int(dilations[i])
        edges = coarse.dilated[d] if d > 1 else coarse.edges
        out = block(out, params[f"bottleneck_block_{i}"], edges,
                    coarse.vmask, False, dtype, n_parts, axis)

    for i in range(n_levels):
        fine = n_levels - i - 1
        out = ell_unpool(out, g.traces[fine], g.children[fine],
                         g.child_counts[fine])
        out = block(out, params[f"decoder_block_{i}"],
                    g.levels[fine].edges, g.levels[fine].vmask,
                    False, dtype, n_parts, axis)

    for i in range(n_repeated_io_convs):
        out = block(out, params[f"output_block_{i}"], g.levels[0].edges,
                    g.levels[0].vmask, False, dtype, n_parts, axis)

    hd = dtype or out.dtype
    out = _dense(out, params["final_linear1"], hd)
    out = _instance_norm_psum(out.astype(jnp.float32), g.levels[0].vmask,
                              axis).astype(hd)
    out = jax.nn.elu(out)
    out = _dense(out, params["final_linear2"], hd)
    return jnp.tanh(out)


def make_sharded_stinet(mesh: Mesh, model, axis: str = "data"):
    """apply(params, pg) -> [V_tot, 3] predictions, vertex dim sharded.

    `model` is the single-device SurfaceTextureInpaintingNet whose config
    (and parameter tree) this forward mirrors; norm must be 'instance'
    (flagship config) — other norms carry parameters the manual forward
    doesn't thread yet."""
    assert model.norm == "instance", "sharded path supports instance norm"
    if getattr(model, "use_label_embedding", False):
        raise NotImplementedError(
            "sharded path does not thread the label embedding yet "
            "(encoder_block_0 is widened by num_embedding; the manual "
            "forward would mis-split its kernel)")
    if model.pooling_type not in ("mean", "max"):
        raise ValueError(f"unknown pooling type {model.pooling_type!r}")
    n_parts = mesh.shape[axis]
    dilations = (list(model.dilations) if model.dilations is not None
                 else [1] * model.n_blocks)

    fwd = functools.partial(
        _forward_local, n_parts=n_parts, axis=axis,
        filter_type=model.filter_type, pooling_type=model.pooling_type,
        n_blocks=model.n_blocks, n_levels=model.n_levels,
        n_repeated_io_convs=model.n_repeated_io_convs, dilations=dilations,
        dtype=model.dtype)

    def apply_fn(params, pg):
        return shard_map(
            fwd, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis),
            check_vma=False)(params, pg)

    return apply_fn


def place_partitioned(mesh: Mesh, pg: PartitionedGraph, axis: str = "data"):
    """Device-put every leaf sharded on dim 0 over the mesh axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), pg)


def make_sharded_train_step(mesh: Mesh, model, tx, use_mask_weighted=True,
                            axis: str = "data"):
    """Jitted full train step on the halo path: sharded forward, masked
    composite L1 (inpainting3d semantics, graph_common.inpainting_loss),
    grads, optimizer update. Params replicated; grads psum automatically
    (GSPMD reduces the sharded-vertex contraction)."""
    apply_fn = make_sharded_stinet(mesh, model, axis)

    from stinet_tpu.trainers.graph_common import inpainting_loss

    def loss_fn(params, pg):
        out = apply_fn(params, pg)
        return inpainting_loss(out, pg.color, pg.mask, pg.levels[0].vmask,
                               use_mask_weighted)[0]

    @jax.jit
    def train_step(params, opt_state, pg, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, pg)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, loss_fn

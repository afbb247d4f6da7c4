"""Full STINet under graph-partition (halo) parallelism.

Runs the ENTIRE flagship forward inside one `shard_map` region over the
`data` mesh axis, consuming the partitioned layout built by
`stinet_tpu.graph.partition`:

  * dense projections (P/Q, lin2, shortcut, head) — local matmuls on each
    shard's [vp, C] slice (pure data parallelism over the vertex dim, MXU);
  * EdgeConv aggregation — ring halo exchange (`ppermute` with the direct
    (i -> i+s+1) permutation per step, one collective per ring distance)
    followed by the unrolled local ELL aggregate;
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


def _halo_exchange(q_loc, send_loc, n_parts, axis):
    """Ship the planned boundary rows: at ring step s, device i sends
    q_loc[send_loc[s]] to device (i+s+1) mod P in ONE ppermute. Returns
    q_loc extended with the received halo blocks (index space matches
    PartEdges.nbr_halo)."""
    if n_parts <= 1:
        return q_loc
    halos = []
    for s in range(send_loc.shape[0]):
        buf = q_loc.at[send_loc[s]].get(mode="promise_in_bounds")
        perm = [(i, (i + s + 1) % n_parts) for i in range(n_parts)]
        halos.append(jax.lax.ppermute(buf, axis, perm))
    return jnp.concatenate([q_loc] + halos, axis=0)


def _row(x, idx):
    return x.at[idx].get(mode="promise_in_bounds")


def _aggregate_mean(p_loc, q_ext, nbr, deg):
    deg_i = deg.astype(jnp.int32)
    acc = jnp.zeros_like(p_loc)
    for d in range(nbr.shape[1]):
        m = jax.nn.relu(p_loc + _row(q_ext, nbr[:, d]))
        acc = acc + jnp.where((d < deg_i)[:, None], m, 0.0)
    inv = 1.0 / jnp.maximum(deg.astype(p_loc.dtype), 1.0)
    return acc * inv[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _halo_conv(n_parts, axis, p, q, nbr, deg, send, rev, rev_deg):
    """mean_{j in N(i)} relu(P[i] + Q[j]) with remote senders via halo, and a
    gather-only backward: dq on the extended (local + halo) sender space is
    re-derived from the reverse tables, then halo-slot gradients ride the
    inverse ppermute back to their owners (the multi-chip analog of the
    single-chip ELL custom VJP, ops/ell.py)."""
    q_ext = _halo_exchange(q, send, n_parts, axis)
    return _aggregate_mean(p, q_ext, nbr, deg)


def _halo_conv_fwd(n_parts, axis, p, q, nbr, deg, send, rev, rev_deg):
    q_ext = _halo_exchange(q, send, n_parts, axis)
    out = _aggregate_mean(p, q_ext, nbr, deg)
    return out, (p, q_ext, nbr, deg, send, rev, rev_deg)


def _halo_conv_bwd(n_parts, axis, res, g):
    p, q_ext, nbr, deg, send, rev, rev_deg = res
    deg_i = deg.astype(jnp.int32)
    inv = 1.0 / jnp.maximum(deg.astype(p.dtype), 1.0)
    gm = g * inv[:, None]

    dp = jnp.zeros_like(p)
    for d in range(nbr.shape[1]):
        grad_mask = (p + _row(q_ext, nbr[:, d]) > 0).astype(p.dtype)
        dp = dp + jnp.where((d < deg_i)[:, None], gm * grad_mask, 0.0)

    rd = rev_deg.astype(jnp.int32)
    dq_ext = jnp.zeros((q_ext.shape[0], p.shape[1]), p.dtype)
    for j in range(rev.shape[1]):
        r = rev[:, j]
        contrib = _row(gm, r) * ((_row(p, r) + q_ext) > 0).astype(p.dtype)
        dq_ext = dq_ext + jnp.where((j < rd)[:, None], contrib, 0.0)

    vp = p.shape[0]
    hw = send.shape[1]
    dq = dq_ext[:vp]
    for s in range(send.shape[0] if n_parts > 1 else 0):
        buf = dq_ext[vp + s * hw: vp + (s + 1) * hw]
        perm = [(i, (i - s - 1) % n_parts) for i in range(n_parts)]
        buf = jax.lax.ppermute(buf, axis, perm)
        # send rows are unique per step (np.unique at plan build): the add
        # touches only the halo boundary, not the vertex-sized buffers
        dq = dq.at[send[s]].add(buf)
    return dp, dq, None, None, None, None, None


_halo_conv.defvjp(_halo_conv_fwd, _halo_conv_bwd)


def _edge_conv_halo(p_loc, q_loc, edges: PartEdges, n_parts, axis):
    """mean_{j in N(i)} relu(P[i] + Q[j]) with remote senders via halo."""
    send_loc = edges.send_idx[0]  # shard_map slices [n_parts, S, H] -> [1, S, H]
    if edges.rev_idx is not None:
        return _halo_conv(n_parts, axis, p_loc, q_loc, edges.nbr_halo,
                          edges.degree, send_loc, edges.rev_idx,
                          edges.rev_deg)
    q_ext = _halo_exchange(q_loc, send_loc, n_parts, axis)
    return _aggregate_mean(p_loc, q_ext, edges.nbr_halo, edges.degree)


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


def _resnet_block(x, bp, edges: PartEdges, vmask, trans_inv, n_parts, axis):
    """GraphResnetBlock (models/stinet.py:207-229) on partitioned data."""
    ff = bp["first_filter"]
    w1, b1 = ff["lin1_kernel"], ff["lin1_bias"]
    if trans_inv:
        xw = x @ w1
        p, q = b1 - xw, xw
    else:
        c = x.shape[1]
        wi, wd = w1[:c], w1[c:]
        p = x @ (wi - wd) + b1
        q = x @ wd
    agg = _edge_conv_halo(p, q, edges, n_parts, axis)
    out = agg @ ff["lin2"]["kernel"] + ff["lin2"]["bias"]
    out = _instance_norm_psum(out, vmask, axis)
    out = jax.nn.elu(out)
    if "shortcut" in bp:
        x = x @ bp["shortcut"]["kernel"] + bp["shortcut"]["bias"]
    return x + out


def _forward_local(params, g: PartitionedGraph, *, n_parts, axis,
                   filter_type, pooling_type, n_blocks, n_levels,
                   n_repeated_io_convs, dilations, remat=True):
    """The STINet forward (models/stinet.py:266-347) on one shard."""
    assert filter_type in ("edgeconv", "edgeconvtransinv"), filter_type
    block = _resnet_block
    if remat:
        block = jax.checkpoint(_resnet_block, static_argnums=(4, 5, 6))

    out = g.x
    for i in range(n_repeated_io_convs):
        trans_inv = (i == 0 and filter_type == "edgeconvtransinv")
        out = block(out, params[f"input_block_{i}"], g.levels[0].edges,
                    g.levels[0].vmask, trans_inv, n_parts, axis)

    pool = ell_pool_mean if pooling_type == "mean" else ell_pool_max
    for i in range(n_levels):
        out = pool(out, g.traces[i], g.children[i], g.child_counts[i])
        out = block(out, params[f"encoder_block_{i}"],
                    g.levels[i + 1].edges, g.levels[i + 1].vmask,
                    False, n_parts, axis)

    coarse = g.levels[n_levels]
    for i in range(n_blocks):
        d = int(dilations[i])
        edges = coarse.dilated[d] if d > 1 else coarse.edges
        out = block(out, params[f"bottleneck_block_{i}"], edges,
                    coarse.vmask, False, n_parts, axis)

    for i in range(n_levels):
        fine = n_levels - i - 1
        out = ell_unpool(out, g.traces[fine], g.children[fine],
                         g.child_counts[fine])
        out = block(out, params[f"decoder_block_{i}"],
                    g.levels[fine].edges, g.levels[fine].vmask,
                    False, n_parts, axis)

    for i in range(n_repeated_io_convs):
        out = block(out, params[f"output_block_{i}"], g.levels[0].edges,
                    g.levels[0].vmask, False, n_parts, axis)

    out = out @ params["final_linear1"]["kernel"] \
        + params["final_linear1"]["bias"]
    out = _instance_norm_psum(out, g.levels[0].vmask, axis)
    out = jax.nn.elu(out)
    out = out @ params["final_linear2"]["kernel"] \
        + params["final_linear2"]["bias"]
    return jnp.tanh(out)


def make_sharded_stinet(mesh: Mesh, model, axis: str = "data"):
    """apply(params, pg) -> [V_tot, 3] predictions, vertex dim sharded.

    `model` is the single-device SurfaceTextureInpaintingNet whose config
    (and parameter tree) this forward mirrors; norm must be 'instance'
    (flagship config) — other norms carry parameters the manual forward
    doesn't thread yet."""
    assert model.norm == "instance", "sharded path supports instance norm"
    n_parts = mesh.shape[axis]
    dilations = (list(model.dilations) if model.dilations is not None
                 else [1] * model.n_blocks)

    fwd = functools.partial(
        _forward_local, n_parts=n_parts, axis=axis,
        filter_type=model.filter_type, pooling_type=model.pooling_type,
        n_blocks=model.n_blocks, n_levels=model.n_levels,
        n_repeated_io_convs=model.n_repeated_io_convs, dilations=dilations)

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

    def loss_fn(params, pg):
        out = apply_fn(params, pg)
        vmask = pg.levels[0].vmask
        composite = jnp.where(pg.mask > 0, out, pg.color)
        per = jnp.abs(composite - pg.color)
        if use_mask_weighted:
            per = per * jnp.power(0.99, pg.mask)
        per = per * vmask[:, None]
        n = jnp.maximum(jnp.sum(vmask) * pg.color.shape[-1], 1.0)
        return jnp.sum(per) / n

    @jax.jit
    def train_step(params, opt_state, pg, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, pg)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, loss_fn

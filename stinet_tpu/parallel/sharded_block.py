"""Graph-partitioned STINet building blocks under shard_map — the composition
layer that turns the halo-exchange conv (parallel/halo.py) into full model
blocks for multi-chip full-scene training (the reference's alternative is
offline cropping; SURVEY.md §5 "long-context analog").

Everything runs inside one shard_map region per block so intermediate
features never leave the device that owns their vertex range:

  conv:     ring halo exchange of the sender projection, local ELL aggregate
  norm:     per-graph instance norm via psum of masked sums over the mesh
  residual: local elementwise

The dense projections (P/Q/Lin2/shortcut) stay OUTSIDE shard_map as plain
sharded matmuls (GSPMD splits them over the vertex dim automatically), so
only the genuinely communicating pieces are hand-scheduled.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from stinet_tpu.parallel.halo import HaloPlan


def sharded_instance_norm(mesh: Mesh, axis: str = "data", eps: float = 1e-5):
    """Single-graph instance norm where the vertex dim is sharded: masked
    sums psum over the mesh axis (FastInstanceNorm semantics, see
    ops/norms.py)."""

    def kernel(x_loc, vmask_loc):
        w = vmask_loc[:, None]
        n = jax.lax.psum(jnp.sum(w), axis)
        s = jax.lax.psum(jnp.sum(x_loc * w, axis=0), axis)
        mean = s / jnp.maximum(n, 1.0)
        centered = (x_loc - mean) * w
        var = jax.lax.psum(jnp.sum(centered * centered, axis=0), axis) \
            / jnp.maximum(n, 1.0)
        return centered * (var + eps) ** -0.5

    return shard_map(kernel, mesh=mesh, in_specs=(P(axis), P(axis)),
                     out_specs=P(axis))


def make_sharded_resnet_block(mesh: Mesh, n_parts: int, plan: HaloPlan,
                              deg: np.ndarray, axis: str = "data"):
    """Returns block(x, params, vmask) computing
    x + elu(inst_norm(Lin2(halo_edge_conv(P(x), Q(x))))) with every
    communicating op inside shard_map. params: dict with lin1 (wi_minus_wd,
    wd, b1 for the edgeconv decomposition), lin2 (kernel, bias), optional
    shortcut (kernel, bias)."""
    from stinet_tpu.parallel.halo import halo_edge_conv

    conv = halo_edge_conv(mesh, n_parts, axis)
    norm = sharded_instance_norm(mesh, axis)
    nbr_halo = jnp.asarray(plan.nbr_halo)
    send_idx = jnp.asarray(plan.send_idx)
    deg = jnp.asarray(deg)

    def block(x, params, vmask):
        p = x @ params["wi_minus_wd"] + params["b1"]
        q = x @ params["wd"]
        agg = conv(p, q, nbr_halo, deg, send_idx)
        out = agg @ params["lin2_kernel"] + params["lin2_bias"]
        out = norm(out, vmask)
        out = jax.nn.elu(out)
        if "shortcut_kernel" in params:
            x = x @ params["shortcut_kernel"] + params["shortcut_bias"]
        return x + out

    return block

"""Graph-partition parallelism — scaling message passing over full uncropped
scenes by partitioning the vertex set across devices (the GNN analog of
context/sequence parallelism; the reference scales by offline 3m cropping
instead, SURVEY.md §2.7/§5).

Vertices are split into contiguous, equal-sized ranges (graph builders emit
locality-ordered vertices, so contiguous ranges approximate spatial
partitions). Each message-passing layer then needs the features of *remote*
senders. Two exchange strategies, both under `jax.shard_map` over the `data`
mesh axis with XLA collectives on ICI:

  * `allgather_edge_conv` — all-gather the sender projections, aggregate
    locally with the ELL tables. Simple, bandwidth ~V*H per layer; right
    when feature matrices are small relative to ICI bandwidth.
  * `halo_edge_conv` + `build_halo_plan` — true halo exchange: a ring of
    P-1 `ppermute` steps ships only the boundary rows each peer actually
    references (host-precomputed send lists, padded to the max halo size).
    Bandwidth ~|boundary|*H — the scalable path for well-partitioned meshes.

Both compute bit-identical results to the single-device ELL kernel on the
locally owned vertex range.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _ell_local(p_loc, q_all, nbr_loc, deg_loc):
    """Unrolled ELL mean-aggregate where receivers are local rows and sender
    rows come from an (already exchanged) sender table."""
    deg_i = deg_loc.astype(jnp.int32)
    acc = jnp.zeros_like(p_loc)
    for d in range(nbr_loc.shape[1]):
        m = jax.nn.relu(
            p_loc + q_all.at[nbr_loc[:, d]].get(mode="promise_in_bounds"))
        acc = acc + jnp.where((d < deg_i)[:, None], m, 0.0)
    inv = 1.0 / jnp.maximum(deg_loc.astype(p_loc.dtype), 1.0)
    return acc * inv[:, None]


def allgather_edge_conv(mesh: Mesh, axis: str = "data"):
    """Returns fn(p, q, nbr, deg) operating on arrays sharded over `axis`
    along dim 0 (nbr holds GLOBAL sender indices)."""

    def kernel(p_loc, q_loc, nbr_loc, deg_loc):
        q_full = jax.lax.all_gather(q_loc, axis, axis=0, tiled=True)
        return _ell_local(p_loc, q_full, nbr_loc, deg_loc)

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))


class HaloPlan(NamedTuple):
    """Host-precomputed exchange plan for one edge set over `n_parts`
    contiguous equal ranges of `v_pad` vertices.

    send_idx [n_parts, n_parts-1, H]: LOCAL row ids this device ships at ring
        step s (to device (me - (s+1)) % n_parts ... i.e. rows that the
        device s+1 hops *behind* needs); pads repeat row 0.
    nbr_halo [v_pad, D]: the ELL table rewritten into the local+halo index
        space: senders owned locally -> [0, Vp); senders received at ring
        step s, slot h -> Vp + s*H + h.
    """
    send_idx: np.ndarray
    nbr_halo: np.ndarray
    halo_width: int


def build_halo_plan(nbr: np.ndarray, v_pad: int, n_parts: int) -> HaloPlan:
    """NOTE: halo kernels aggregate the ELL-resident edges; build plans from
    spill-free edge sets (EdgeSet.spill_src is None) or pass ell_degree."""
    assert v_pad % n_parts == 0, "vertex dim must divide the mesh axis"
    vp = v_pad // n_parts
    owner = np.asarray(nbr) // vp                      # [V, D]
    me = (np.arange(v_pad) // vp)[:, None]
    # ring step at which each remote sender arrives: sender owned by
    # (me - (s+1)) mod P arrives at step s (we receive from the left)
    step = (me - owner - 1) % n_parts                  # n_parts-1 == local
    remote = owner != me

    # collect per (receiver-device, source-device) needed sender rows
    nbr = np.asarray(nbr)
    send_lists = [[[] for _ in range(n_parts - 1)] for _ in range(n_parts)]
    recv_slot = np.zeros_like(nbr)
    for part in range(n_parts):
        rows = slice(part * vp, (part + 1) * vp)
        for s in range(n_parts - 1):
            src_dev = (part - s - 1) % n_parts
            mask = remote[rows] & (step[rows] == s)
            needed = np.unique(nbr[rows][mask])
            send_lists[src_dev][s] = list(needed - src_dev * vp)
            sl = recv_slot[rows]
            sl[mask] = np.searchsorted(needed, nbr[rows][mask])
            recv_slot[rows] = sl

    h = max((len(l) for dev in send_lists for l in dev), default=0)
    h = max(h, 1)
    send_idx = np.zeros((n_parts, max(n_parts - 1, 1), h), np.int32)
    for dev in range(n_parts):
        for s in range(n_parts - 1):
            l = send_lists[dev][s]
            send_idx[dev, s, :len(l)] = l

    local_idx = np.asarray(nbr) % vp
    halo_idx = vp + step * h + recv_slot
    nbr_halo = np.where(remote, halo_idx, local_idx).astype(np.int32)
    return HaloPlan(send_idx=send_idx, nbr_halo=nbr_halo, halo_width=h)


def halo_edge_conv(mesh: Mesh, n_parts: int, axis: str = "data"):
    """Returns fn(p, q, nbr_halo, deg, send_idx) — ring halo exchange via
    ppermute, then local ELL aggregation in the local+halo index space.
    send_idx is the [n_parts, S, H] plan (sharded over its first dim)."""

    def kernel(p_loc, q_loc, nbr_loc, deg_loc, send_loc):
        send_loc = send_loc[0]  # [S, H]
        steps = send_loc.shape[0]
        halos = []
        # data moves RIGHTWARD: owner src -> src+1 -> ... -> src+s+1 == the
        # receiver of step s (build_halo_plan's step convention)
        perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]
        for s in range(steps if n_parts > 1 else 0):
            buf = q_loc.at[send_loc[s]].get(mode="promise_in_bounds")
            for _ in range(s + 1):
                buf = jax.lax.ppermute(buf, axis, perm)
            halos.append(buf)
        q_ext = jnp.concatenate([q_loc] + halos, axis=0) if halos else q_loc
        return _ell_local(p_loc, q_ext, nbr_loc, deg_loc)

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))

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
    """Host-precomputed PIPELINED ring exchange plan for one edge set over
    `n_parts` contiguous equal ranges of `v_pad` vertices.

    The ring runs S = n_parts-1 synchronized hops; every hop each device
    sends exactly ONE buffer of W rows to its right neighbor (i -> i+1).
    The buffer a device sends at hop t originates at the device t hops to
    its left: at hop 0 it gathers its own boundary union (rows ANY
    downstream receiver needs); at hop t>0 it filters the buffer it just
    received down to the rows still needed >= t+1 hops from their origin.
    Per-hop ICI volume is W (constant in n_parts) vs the previous schedule's
    O(n_parts) growth from re-forwarding each step-s buffer s+1 times.

    send_idx [n_parts, S, W]: hop-t gather list for the device. Row ids
        index q_loc at t=0 and the hop-(t-1) RECEIVED buffer at t>0
        (chained gather); pads use 0 (never referenced by receivers).
    nbr_halo [v_pad, D]: the ELL table rewritten into the local+halo index
        space: senders owned locally -> [0, Vp); a sender received at hop
        s, slot h -> Vp + s*W + h.
    """
    send_idx: np.ndarray
    nbr_halo: np.ndarray
    halo_width: int


def build_halo_plan(nbr: np.ndarray, v_pad: int, n_parts: int) -> HaloPlan:
    """NOTE: halo kernels aggregate the ELL-resident edges; build plans from
    spill-free edge sets (EdgeSet.spill_src is None) or pass ell_degree."""
    assert v_pad % n_parts == 0, "vertex dim must divide the mesh axis"
    vp = v_pad // n_parts
    nbr = np.asarray(nbr)
    owner = nbr // vp                                  # [V, D]
    me = (np.arange(v_pad) // vp)[:, None]
    # ring hop at which each remote sender's row arrives: a row owned by
    # (me - (s+1)) mod P arrives at hop s (data flows rightward)
    step = (me - owner - 1) % n_parts                  # n_parts-1 == local
    remote = owner != me
    steps = n_parts - 1

    # need[o][s]: LOCAL row ids of origin o needed by the receiver s+1 hops
    # to its right
    need = [[np.zeros(0, np.int64)] * max(steps, 1) for _ in range(n_parts)]
    for r in range(n_parts):
        rows = slice(r * vp, (r + 1) * vp)
        for s in range(steps):
            o = (r - s - 1) % n_parts
            mask = remote[rows] & (step[rows] == s)
            need[o][s] = np.unique(nbr[rows][mask]) - o * vp

    # union[o][t]: rows of origin o still in transit at hop t (needed by a
    # receiver >= t+1 hops away). Monotone: union[o][t] is a subset of
    # union[o][t-1], so hop-t buffers only ever shrink along the ring.
    union = [[None] * max(steps, 1) for _ in range(n_parts)]
    for o in range(n_parts):
        acc = np.zeros(0, np.int64)
        for t in range(steps - 1, -1, -1):
            acc = np.union1d(acc, need[o][t])
            union[o][t] = acc

    w = max((len(union[o][t]) for o in range(n_parts)
             for t in range(steps)), default=0)
    w = max(w, 1)
    send_idx = np.zeros((n_parts, max(steps, 1), w), np.int32)
    for t in range(steps):
        for o in range(n_parts):
            carrier = (o + t) % n_parts
            if t == 0:
                idx = union[o][0]                       # rows of q_loc
            else:  # positions within the hop-(t-1) buffer (same origin)
                idx = np.searchsorted(union[o][t - 1], union[o][t])
            send_idx[carrier, t, :len(idx)] = idx

    # receiver side: hop-s buffer from origin o = r-s-1 lands at
    # ext offset vp + s*w; slot = position of the row in union[o][s]
    local_idx = nbr % vp
    halo_idx = np.zeros_like(nbr)
    for r in range(n_parts):
        rows = slice(r * vp, (r + 1) * vp)
        for s in range(steps):
            o = (r - s - 1) % n_parts
            mask = remote[rows] & (step[rows] == s)
            sub = halo_idx[rows]
            sub[mask] = vp + s * w + np.searchsorted(
                union[o][s], nbr[rows][mask] - o * vp)
            halo_idx[rows] = sub
    nbr_halo = np.where(remote, halo_idx, local_idx).astype(np.int32)
    return HaloPlan(send_idx=send_idx, nbr_halo=nbr_halo, halo_width=w)


def halo_exchange(q_loc, send_loc, n_parts, axis):
    """Pipelined ring exchange (inside shard_map): chained
    gather -> single-hop ppermute per hop, per the build_halo_plan
    schedule. Returns q_loc extended with the S received hop buffers
    (index space = HaloPlan.nbr_halo). Differentiable by construction:
    each gather transposes to a scatter-add over its (unique) send rows
    and each ppermute to its inverse permutation."""
    if n_parts <= 1:
        return q_loc
    perm = [(i, (i + 1) % n_parts) for i in range(n_parts)]
    halos = []
    base = q_loc
    for t in range(send_loc.shape[0]):
        buf = base.at[send_loc[t]].get(mode="promise_in_bounds")
        buf = jax.lax.ppermute(buf, axis, perm)
        halos.append(buf)
        base = buf
    return jnp.concatenate([q_loc] + halos, axis=0)


def halo_edge_conv(mesh: Mesh, n_parts: int, axis: str = "data"):
    """Returns fn(p, q, nbr_halo, deg, send_idx) — pipelined ring halo
    exchange, then local ELL aggregation in the local+halo index space.
    send_idx is the [n_parts, S, W] plan (sharded over its first dim)."""

    def kernel(p_loc, q_loc, nbr_loc, deg_loc, send_loc):
        q_ext = halo_exchange(q_loc, send_loc[0], n_parts, axis)
        return _ell_local(p_loc, q_ext, nbr_loc, deg_loc)

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))

"""ELL (padded neighbor table) message passing — the scatter-free fast path.

XLA lowers segment-sum scatters on TPU to slow serialized updates; gathers,
by contrast, are fast vector loads. Graph builders therefore emit, alongside
the COO edge list, an ELL layout:

  nbr     [V_pad, D_in]  — for receiver v, slot d: sender vertex id
                           (pad slots point at the trash vertex)
  rev_dst [V_pad, D_out] — for sender s, slot j: receiver vertex id of its
                           j-th outgoing edge (pad -> trash vertex)
  out_degree [V_pad]     — valid out-edge count per sender

Forward aggregation unrolls over the (static, small) slot axis: each step is
a [V, H] row gather + elementwise work accumulated in registers — no
[V, D, H] intermediate, no scatter. The custom VJP re-derives the message
gradient at each sender from `rev_dst`:

  dq[s] = sum_j 1[j < out_deg(s)] * g[i_j] * relu'(p[i_j] + q[s]),
          i_j = rev_dst[s, j]        (sum form; callers apply 1/deg)

which is again pure unrolled gathers. FLOPs overhead vs COO is
max_degree/avg_degree; builders fall back to COO when degrees are too skewed.
"""
import os

import jax
import jax.numpy as jnp


def _row(x, idx):
    return x.at[idx].get(mode="promise_in_bounds")


def _slot_mode():
    """How the static slot axis is realized in the traced program:
      unroll  — one gather+mask per slot, fully unrolled (fastest runtime:
                XLA fuses all slots into one kernel; but program size grows
                with D x blocks x fwd+bwd, which drove XLA:TPU cold compiles
                of the f32 flagship to 300-1200 s, VERDICT r2 item 2);
      fori    — lax.fori_loop over slots (program size O(1) in D; the
                accumulator round-trips HBM each step);
      batched — one [V, D, H] gather + masked sum (single gather instruction;
                relies on XLA fusing the reduce into the gather consumer).
    Read at trace time so tests/benches can switch per-call."""
    return os.environ.get("STINET_ELL_MODE", "unroll")


@jax.custom_vjp
def ell_edge_conv_sum(p, q, nbr, rev_dst, deg_in, deg_out):
    """out[v] = sum_d relu(p[v] + q[nbr[v, d]]) over valid slots — the
    EdgeConv message sum in ELL form (relu is the filter MLP's inner
    activation, reference edge_conv_filter.py:46-57). `deg_in`/`deg_out`
    count only the ELL-resident edges; callers divide by the TOTAL degree
    (adding any COO spill contribution first) to realize mean aggregation."""
    return _forward(p, q, nbr, deg_in)


def ell_edge_conv_mean(p, q, nbr, rev_dst, deg_in, deg_out):
    """Mean aggregation for spill-free edge sets."""
    acc_dt = jnp.promote_types(p.dtype, jnp.float32)
    inv = 1.0 / jnp.maximum(deg_in.astype(acc_dt), 1.0)
    s = ell_edge_conv_sum(p, q, nbr, rev_dst, deg_in, deg_out)
    return (s.astype(acc_dt) * inv[:, None]).astype(p.dtype)


def _forward(p, q, nbr, deg_in):
    d_in = nbr.shape[1]
    deg_i = deg_in.astype(jnp.int32)
    # accumulate in >= f32 even under bf16 compute (sums over up to D slots)
    acc_dt = jnp.promote_types(p.dtype, jnp.float32)
    mode = _slot_mode()
    if mode == "batched":
        qn = q.at[nbr].get(mode="promise_in_bounds")  # [V, D, H]
        m = jax.nn.relu(p[:, None, :] + qn).astype(acc_dt)
        valid = (jax.lax.broadcasted_iota(jnp.int32, nbr.shape, 1)
                 < deg_i[:, None])
        return jnp.sum(jnp.where(valid[..., None], m, 0.0),
                       axis=1).astype(p.dtype)
    if mode == "fori":
        nbr_t = nbr.T  # [D, V]: each step slices one contiguous row

        def body(d, acc):
            idx = jax.lax.dynamic_index_in_dim(nbr_t, d, 0, keepdims=False)
            m = jax.nn.relu(p + _row(q, idx))
            return acc + jnp.where((d < deg_i)[:, None], m.astype(acc_dt),
                                   0.0)
        return jax.lax.fori_loop(0, d_in, body,
                                 jnp.zeros(p.shape, acc_dt)).astype(p.dtype)
    acc = jnp.zeros(p.shape, acc_dt)
    for d in range(d_in):
        m = jax.nn.relu(p + _row(q, nbr[:, d]))
        acc = acc + jnp.where((d < deg_i)[:, None], m.astype(acc_dt), 0.0)
    return acc.astype(p.dtype)


def _fwd_rule(p, q, nbr, rev_dst, deg_in, deg_out):
    return _forward(p, q, nbr, deg_in), (p, q, nbr, rev_dst, deg_in, deg_out)


def _bwd_rule(res, g):
    p, q, nbr, rev_dst, deg_in, deg_out = res
    deg_i = deg_in.astype(jnp.int32)
    deg_o = deg_out.astype(jnp.int32)
    # accumulate gradients in >= f32: bf16 accumulation over D slots both
    # drifts and compiles to a pathological chain of sub-f32 adds on TPU
    acc_dt = jnp.promote_types(p.dtype, jnp.float32)
    mode = _slot_mode()

    if mode == "batched":
        qn = q.at[nbr].get(mode="promise_in_bounds")  # [V, D_in, H]
        act = (p[:, None, :] + qn > 0).astype(acc_dt)
        valid = (jax.lax.broadcasted_iota(jnp.int32, nbr.shape, 1)
                 < deg_i[:, None])[..., None]
        dp = jnp.sum(jnp.where(valid, g[:, None, :].astype(acc_dt) * act,
                               0.0), axis=1)

        i = rev_dst  # [V, D_out]
        gi = g.at[i].get(mode="promise_in_bounds").astype(acc_dt)
        pi = p.at[i].get(mode="promise_in_bounds")
        act_o = (pi + q[:, None, :] > 0).astype(acc_dt)
        valid_o = (jax.lax.broadcasted_iota(jnp.int32, i.shape, 1)
                   < deg_o[:, None])[..., None]
        dq = jnp.sum(jnp.where(valid_o, gi * act_o, 0.0), axis=1)
        return (dp.astype(p.dtype), dq.astype(q.dtype),
                None, None, None, None)

    if mode == "fori":
        nbr_t, rev_t = nbr.T, rev_dst.T
        g32 = g.astype(acc_dt)

        def body_p(d, dp):
            idx = jax.lax.dynamic_index_in_dim(nbr_t, d, 0, keepdims=False)
            grad_mask = (p + _row(q, idx) > 0).astype(acc_dt)
            return dp + jnp.where((d < deg_i)[:, None], g32 * grad_mask, 0.0)

        def body_q(j, dq):
            i = jax.lax.dynamic_index_in_dim(rev_t, j, 0, keepdims=False)
            contrib = (_row(g, i).astype(acc_dt)
                       * (_row(p, i) + q > 0).astype(acc_dt))
            return dq + jnp.where((j < deg_o)[:, None], contrib, 0.0)

        dp = jax.lax.fori_loop(0, nbr.shape[1], body_p,
                               jnp.zeros(p.shape, acc_dt))
        dq = jax.lax.fori_loop(0, rev_dst.shape[1], body_q,
                               jnp.zeros(q.shape, acc_dt))
        return (dp.astype(p.dtype), dq.astype(q.dtype),
                None, None, None, None)

    dp = jnp.zeros(p.shape, acc_dt)
    for d in range(nbr.shape[1]):
        grad_mask = (p + _row(q, nbr[:, d]) > 0).astype(acc_dt)
        dp = dp + jnp.where((d < deg_i)[:, None],
                            g.astype(acc_dt) * grad_mask, 0.0)

    dq = jnp.zeros(q.shape, acc_dt)
    for j in range(rev_dst.shape[1]):
        i = rev_dst[:, j]
        contrib = (_row(g, i).astype(acc_dt)
                   * (_row(p, i) + q > 0).astype(acc_dt))
        dq = dq + jnp.where((j < deg_o)[:, None], contrib, 0.0)
    return dp.astype(p.dtype), dq.astype(q.dtype), None, None, None, None


ell_edge_conv_sum.defvjp(_fwd_rule, _bwd_rule)


def ell_neighbor_mean(x, nbr, deg_in):
    """Plain masked neighbor mean in ELL form (SAGE-style aggregation).
    Differentiable through XLA (not on the STINet hot path). Slot sums
    accumulate in >= f32 (the file-wide rule: bf16 slot chains drift and
    compile to pathological sub-f32 adds on TPU)."""
    deg_i = deg_in.astype(jnp.int32)
    acc_dt = jnp.promote_types(x.dtype, jnp.float32)
    acc = jnp.zeros(x.shape, acc_dt)
    for d in range(nbr.shape[1]):
        acc = acc + jnp.where((d < deg_i)[:, None],
                              _row(x, nbr[:, d]).astype(acc_dt), 0.0)
    inv = 1.0 / jnp.maximum(deg_in.astype(acc_dt), 1.0)
    return (acc * inv[:, None]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Children-table pooling/unpooling: the trace map (fine -> coarse) induces a
# children table (coarse -> its fine vertices). Pooling becomes an unrolled
# gather+reduce over child slots; unpooling stays a trace gather; all VJPs
# are likewise gathers (mean: dg_fine = g[trace]/count[trace]; max: routed by
# equality to the achieving children; unpool: sum over children).
# ---------------------------------------------------------------------------

@jax.custom_vjp
def ell_pool_mean(x, trace, children, counts):
    s = _pool_sum(x, children, counts)
    return (s / jnp.maximum(counts.astype(s.dtype), 1.0)[:, None]) \
        .astype(x.dtype)


def _pool_sum(x, children, counts):
    """Child-slot sum in >= f32 (same accumulation rule as the edge-conv
    slot loops above); callers divide/cast in the accumulator dtype and
    downcast their final result."""
    cnt = counts.astype(jnp.int32)
    acc_dt = jnp.promote_types(x.dtype, jnp.float32)
    acc = jnp.zeros((children.shape[0], x.shape[1]), acc_dt)
    for c in range(children.shape[1]):
        acc = acc + jnp.where((c < cnt)[:, None],
                              _row(x, children[:, c]).astype(acc_dt), 0.0)
    return acc


def _pool_mean_fwd(x, trace, children, counts):
    return ell_pool_mean(x, trace, children, counts), (trace, counts)


def _pool_mean_bwd(res, g):
    trace, counts = res
    inv = 1.0 / jnp.maximum(counts, 1.0)
    d_fine = _row(g * inv[:, None], trace)
    return d_fine, None, None, None


ell_pool_mean.defvjp(_pool_mean_fwd, _pool_mean_bwd)


@jax.custom_vjp
def ell_pool_max(x, trace, children, counts):
    return _pool_max_fwd_impl(x, children, counts)[0]


def _pool_max_fwd_impl(x, children, counts):
    """Returns (max, argmax-fine-index). The argmax records exactly one
    achieving child per (segment, feature) — the lowest child slot — so the
    backward routes the full gradient to a single element, matching
    torch_scatter.scatter_max (reference pooling,
    surfacetextureinpaintingnet.py:386)."""
    cnt = counts.astype(jnp.int32)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    acc = jnp.full((children.shape[0], x.shape[1]), neg, x.dtype)
    arg = jnp.full((children.shape[0], x.shape[1]), -1, jnp.int32)
    for c in range(children.shape[1]):
        child = children[:, c].astype(jnp.int32)
        cand = jnp.where((c < cnt)[:, None], _row(x, child), neg)
        better = cand > acc  # strict: ties keep the earlier child
        acc = jnp.where(better, cand, acc)
        arg = jnp.where(better, child[:, None], arg)
    # empty segments -> 0 (torch_scatter parity, see ops/segment.py)
    return jnp.where((cnt > 0)[:, None], acc, 0.0), arg


def _pool_max_fwd(x, trace, children, counts):
    out, arg = _pool_max_fwd_impl(x, children, counts)
    return out, (trace, arg)


def _pool_max_bwd(res, g):
    trace, arg = res
    # gather-only backward: fine vertex f receives gradient iff it is THE
    # recorded argmax of its parent segment (single-element routing)
    fine_idx = jax.lax.broadcasted_iota(jnp.int32, (trace.shape[0], 1), 0)
    routed = (_row(arg, trace) == fine_idx).astype(g.dtype)
    d_fine = _row(g, trace) * routed
    return d_fine, None, None, None


ell_pool_max.defvjp(_pool_max_fwd, _pool_max_bwd)


@jax.custom_vjp
def ell_unpool(x, trace, children, counts):
    """out[f] = x[trace[f]] with a gather-only backward (sum over
    children)."""
    return _row(x, trace)


def _unpool_fwd(x, trace, children, counts):
    return _row(x, trace), (children, counts)


def _unpool_bwd(res, g):
    children, counts = res
    return _pool_sum(g, children, counts).astype(g.dtype), None, None, None


ell_unpool.defvjp(_unpool_fwd, _unpool_bwd)

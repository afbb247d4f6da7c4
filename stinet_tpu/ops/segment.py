"""Static-shape segment reductions — the TPU-native replacement for the
reference's torch_scatter calls (scatter_mean/scatter_max used at
/root/reference/models/surfacetextureinpaintingnet.py:382-388 for pooling and
inside every PyG MessagePassing aggregation).

All functions take a *static* `num_segments` (the padded vertex count of the
destination level) so XLA compiles a single fixed-shape scatter. Padded
entries must carry a segment id pointing into the pad region (callers arrange
for pad edges / pad trace entries to target the last padded vertex), so no
masking is needed here beyond what the id layout provides.

Sortedness: graph builders (`stinet_tpu.graph.build`) emit edges sorted by
destination, letting XLA lower the scatter-add to a faster sorted-segment
reduction (`indices_are_sorted=True`).
"""
import functools

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments, indices_are_sorted=False):
    """Sum of `data` rows per segment. data: [N, ...], ids: [N] int32."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_count(segment_ids, num_segments, valid_mask=None,
                  indices_are_sorted=False, dtype=jnp.float32):
    """Number of (valid) entries per segment. Returns [num_segments]."""
    ones = jnp.ones(segment_ids.shape[0], dtype=dtype)
    if valid_mask is not None:
        ones = ones * valid_mask.astype(dtype)
    return jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments, indices_are_sorted=False,
                 counts=None):
    """Mean of `data` rows per segment; empty segments yield 0.

    Matches torch_scatter.scatter_mean semantics (empty segments -> 0) used
    for STINet pooling (reference surfacetextureinpaintingnet.py:384).
    """
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    if counts is None:
        counts = segment_count(segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted,
                               dtype=s.dtype)
    denom = jnp.maximum(counts, 1.0)
    if s.ndim > 1:
        denom = denom.reshape((-1,) + (1,) * (s.ndim - 1))
    return s / denom


def segment_max(data, segment_ids, num_segments, indices_are_sorted=False,
                empty_value=0.0):
    """Max of `data` rows per segment; empty segments yield `empty_value`.

    torch_scatter.scatter_max parity (reference
    surfacetextureinpaintingnet.py:386): the gradient flows to exactly ONE
    argmax element per (segment, feature) — torch_scatter records a single
    argmax index and scatters the incoming gradient into it, whereas jax's
    native scatter-max VJP splits ties across all achievers. Empty segments
    are filled with `empty_value` instead of -inf.
    """
    return _segment_max_single_arg(
        data, segment_ids, num_segments, indices_are_sorted, empty_value)


def _segment_max_raw(data, segment_ids, num_segments, indices_are_sorted,
                     empty_value):
    m = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    counts = segment_count(segment_ids, num_segments,
                           indices_are_sorted=indices_are_sorted)
    nonempty = counts > 0
    if m.ndim > 1:
        nonempty = nonempty.reshape((-1,) + (1,) * (m.ndim - 1))
    return jnp.where(nonempty, m, jnp.asarray(empty_value, dtype=m.dtype)), m


def _row_idx(data):
    n = data.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    if data.ndim == 1:
        return idx[:, 0]
    return jnp.broadcast_to(idx.reshape((n,) + (1,) * (data.ndim - 1)),
                            data.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _segment_max_single_arg(data, segment_ids, num_segments,
                            indices_are_sorted, empty_value):
    return _segment_max_raw(data, segment_ids, num_segments,
                            indices_are_sorted, empty_value)[0]


def _smax_fwd(data, segment_ids, num_segments, indices_are_sorted,
              empty_value):
    out, raw = _segment_max_raw(data, segment_ids, num_segments,
                                indices_are_sorted, empty_value)
    # one argmax per (segment, feature): highest data row index among
    # achievers (any single achiever satisfies torch_scatter semantics)
    idx = _row_idx(data)
    cand = jnp.where(data == raw.at[segment_ids].get(
        mode="promise_in_bounds"), idx, -1)
    arg = jax.ops.segment_max(cand, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return out, (idx, segment_ids, arg)


def _smax_bwd(num_segments, indices_are_sorted, empty_value, res, g):
    idx, segment_ids, arg = res
    routed = (idx == arg.at[segment_ids].get(
        mode="promise_in_bounds")).astype(g.dtype)
    d = g.at[segment_ids].get(mode="promise_in_bounds") * routed
    return d, None


_segment_max_single_arg.defvjp(_smax_fwd, _smax_bwd)


def segment_max_int(data, segment_ids, num_segments, indices_are_sorted=False,
                    empty_value=0):
    """Integer segment max (no VJP needed), used to pool batch/graph ids
    through trace maps (reference surfacetextureinpaintingnet.py:422)."""
    m = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    counts = segment_count(segment_ids, num_segments,
                           indices_are_sorted=indices_are_sorted,
                           dtype=jnp.int32)
    return jnp.where(counts > 0, m, empty_value)

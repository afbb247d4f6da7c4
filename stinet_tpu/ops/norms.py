"""Masked per-graph normalization primitives.

The reference's FastInstanceNorm and SingleBatchGraphNorm
(/root/reference/models/modules/fastinstancenorm.py:53,
 singlebatchgroupnorm.py:54-70) rely on a *contiguity hack* — they assume all
graphs in a batch are equal-sized and contiguous (`batch_ptr = linspace`).
Here the batched, padded representation makes that honest: statistics are
segment reductions over an explicit per-vertex `graph_id`, with pad rows
excluded via `valid_mask`. For the equal-size batches the reference supports,
results agree; these also work for ragged batches.

All variances are biased (divide by N), matching torch.nn.functional
.instance_norm and the reference's `var = sumsq / norm`.
"""
import os

import jax.numpy as jnp


def _matmul_reduce():
    """Opt-in (STINET_NORM_MATMUL_REDUCE=1): single-graph norm sums as
    mask-vector matmuls (w.T @ x) instead of jnp.sum. The B=4 probe
    measured the one-hot MXU reduction FASTER than XLA's plain sum at
    [262k, 64] (0.99 vs 1.6 ms, bench_batched_probe.py); gated until the
    full-model A/B confirms on hardware (op microbenches mislead)."""
    return os.environ.get("STINET_NORM_MATMUL_REDUCE") == "1"


def _group_sum(x, graph_id, num_graphs):
    """Per-graph segment sum [V, C] -> [G, C] as a one-hot MXU matmul.

    G (scene count) is tiny and static, so the [G, V] @ [V, C] product is
    ~V*G*C flops on the MXU — versus a serialized scatter for
    jax.ops.segment_sum on TPU, which made every multi-graph norm layer a
    hot spot (batched B=4 serving measured ~2.9x worse than linear before
    this). Pad rows carry graph_id == num_graphs and match no one-hot
    column, so they contribute nowhere. Accumulates in >= f32 and RETURNS
    the accumulator dtype: downcasting here quantized bf16 callers' valid
    counts (10000 rounds to the nearest bf16), shifting every mean/var;
    callers cast their final normalized output back to x.dtype."""
    acc_dt = jnp.promote_types(x.dtype, jnp.float32)
    oh = (graph_id[None, :] == jnp.arange(num_graphs,
                                          dtype=graph_id.dtype)[:, None])
    return oh.astype(acc_dt) @ x.astype(acc_dt)


def _broadcast_rows(table, graph_id, num_graphs):
    """Per-vertex broadcast [G, C] -> [V, C] of a per-graph table as a
    one-hot MXU matmul. `jnp.take(table, graph_id)` lowers to a V-row
    dynamic gather, which TPUs serialize; the [V, G] @ [G, C] product is
    a trivially small matmul instead. Pad rows (graph_id == num_graphs)
    match no one-hot column and broadcast to zero — callers mask pad rows
    anyway, so semantics are unchanged from the clipped take."""
    oh = (graph_id[:, None] == jnp.arange(num_graphs,
                                          dtype=graph_id.dtype)[None, :])
    return oh.astype(table.dtype) @ table


def _per_graph_mean(x, graph_id, num_graphs, valid_mask):
    """Masked per-graph mean and count. x: [V, C] -> ([G, C], [G, 1]),
    in the >= f32 accumulator dtype (callers downcast their final output).
    num_graphs == 1 avoids even the one-hot product (the common case:
    batch_size 1 scenes and the single-graph FastInstanceNorm path)."""
    acc = jnp.promote_types(x.dtype, jnp.float32)
    w = valid_mask.astype(acc)[:, None]
    xa = x.astype(acc)
    if num_graphs == 1:
        if _matmul_reduce():
            s = w.T @ xa  # [1, C]; the product applies the mask
        else:
            s = jnp.sum(xa * w, axis=0, keepdims=True)
        n = jnp.sum(w, axis=0, keepdims=True)
        return s / jnp.maximum(n, 1.0), n
    s = _group_sum(xa * w, graph_id, num_graphs)
    n = _group_sum(w, graph_id, num_graphs)
    return s / jnp.maximum(n, 1.0), n


def masked_instance_norm(x, graph_id, num_graphs, valid_mask, eps=1e-5):
    """Per-graph, per-channel standardization (InstanceNorm semantics,
    affine=False as in the reference's default FastInstanceNorm config,
    fastinstancenorm.py:37-40). Pad rows are zeroed on output. Statistics
    accumulate in >= f32 regardless of x.dtype; only the normalized
    output is cast back (a quantized bf16 valid-count shifts every
    mean/var — no-op for the in-model f32-stat paths)."""
    acc = jnp.promote_types(x.dtype, jnp.float32)
    w = valid_mask.astype(acc)[:, None]
    xa = x.astype(acc)
    mean, n = _per_graph_mean(x, graph_id, num_graphs, valid_mask)
    if num_graphs == 1:
        centered = (xa - mean[0]) * w
        if _matmul_reduce():
            # centered is already masked; w.T re-selects the valid rows
            var = (w.T @ (centered * centered)) / jnp.maximum(n, 1.0)
        else:
            var = jnp.sum(centered * centered, axis=0, keepdims=True) \
                / jnp.maximum(n, 1.0)
        return (centered * (var[0] + eps) ** -0.5).astype(x.dtype)
    centered = (xa - _broadcast_rows(mean, graph_id, num_graphs)) * w
    var = _group_sum(centered * centered, graph_id, num_graphs) \
        / jnp.maximum(n, 1.0)
    inv = (var + eps) ** -0.5
    return (centered
            * _broadcast_rows(inv, graph_id, num_graphs)).astype(x.dtype)


def masked_graph_norm(x, graph_id, num_graphs, valid_mask, weight, bias,
                      mean_scale, eps=1e-5):
    """GraphNorm (arXiv:2009.03294) with learned mean scale α:
    out = γ * (x - α·E[x]) / sqrt(E[(x - α·E[x])²] + eps) + β.

    Matches SingleBatchGraphNorm (singlebatchgroupnorm.py:46-71) with honest
    per-graph segments instead of the equal-size shortcut. Note the variance
    is the *uncentered* second moment of (x - α·mean), as in the reference.
    """
    acc = jnp.promote_types(x.dtype, jnp.float32)
    w = valid_mask.astype(acc)[:, None]
    xa = x.astype(acc)
    mean, n = _per_graph_mean(x, graph_id, num_graphs, valid_mask)
    if num_graphs == 1:
        out = (xa - mean[0] * mean_scale) * w
        if _matmul_reduce():
            var = (w.T @ (out * out)) / jnp.maximum(n, 1.0)
        else:
            var = jnp.sum(out * out, axis=0, keepdims=True) \
                / jnp.maximum(n, 1.0)
        out = out * (var[0] + eps) ** -0.5
        return ((weight * out + bias) * w).astype(x.dtype)
    out = (xa - _broadcast_rows(mean, graph_id, num_graphs) * mean_scale) * w
    var = _group_sum(out * out, graph_id, num_graphs) / jnp.maximum(n, 1.0)
    std_inv = (var + eps) ** -0.5
    out = out * _broadcast_rows(std_inv, graph_id, num_graphs)
    return ((weight * out + bias) * w).astype(x.dtype)


def masked_batch_norm_stats(x, valid_mask):
    """Masked mean/biased-variance over all valid rows (PyG BatchNorm
    normalizes over the full node dimension). Returns (mean [C], var [C])."""
    w = valid_mask.astype(x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w, axis=0) / n
    centered = (x - mean) * w
    var = jnp.sum(centered * centered, axis=0) / n
    return mean, var

"""Graph-domain quality metrics, jit-friendly (static shapes, masked).

Parity targets (/root/reference/utils/metrics/graph_metrics.py):
  psnr              — -10 log10(mean((x-y)^2 / data_range^2) + 1e-8)
  graph_total_variation — sum_e |x[src_e] - x[dst_e]| / (N * C)
  graph_laplace_variance — var over vertices of the graph Laplacian of luma
All functions take valid masks/counts so pad rows/edges are excluded.
"""
import jax.numpy as jnp

from stinet_tpu.graph.hierarchy import EdgeSet
from stinet_tpu.ops.message_passing import gather_edge_features, length_mask
from stinet_tpu.ops.segment import segment_sum

_EPS = 1e-8


def psnr(x, y, valid_mask, data_range=2.0):
    """PSNR over valid rows. x, y: [V_pad, C]; valid_mask: [V_pad]."""
    w = valid_mask[:, None]
    n = jnp.maximum(jnp.sum(w) * x.shape[1], 1.0)
    mse = jnp.sum(((x - y) / data_range) ** 2 * w) / n
    return -10.0 * jnp.log10(mse + _EPS)


def masked_psnr(x, y, valid_mask, region_mask, data_range=2.0):
    """PSNR restricted to the inpainting region (reference psnr_mask_only,
    inpainting3d_trainer.py:261-263) — a weighted mean over the dynamic
    subset, static-shape."""
    w = (valid_mask * region_mask)[:, None]
    n = jnp.maximum(jnp.sum(w) * x.shape[1], 1.0)
    mse = jnp.sum(((x - y) / data_range) ** 2 * w) / n
    return -10.0 * jnp.log10(mse + _EPS)


def graph_total_variation(x, edges: EdgeSet, num_vertices):
    """sum_e |x[src] - x[dst]| / (N*C) over valid edges."""
    if edges.nbr is not None:
        return graph_tv_and_lap_var(x, edges, num_vertices)[0]
    emask = edges.edge_mask(dtype=x.dtype)
    diff = jnp.abs(gather_edge_features(x, edges.src)
                   - gather_edge_features(x, edges.dst))
    tv = jnp.sum(diff * emask[:, None])
    return tv / (jnp.maximum(num_vertices.astype(x.dtype), 1.0) * x.shape[1])


def _grayscale(x):
    return 0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]


def graph_laplace_variance(x, edges: EdgeSet, num_vertices):
    """Biased variance over valid vertices of the luma graph Laplacian."""
    if edges.nbr is not None:
        return graph_tv_and_lap_var(x, edges, num_vertices)[1]
    v_pad = edges.degree.shape[0]
    gray = _grayscale(x)
    s = segment_sum(gather_edge_features(gray, edges.src), edges.dst, v_pad,
                    indices_are_sorted=True)
    lap = s - edges.degree[:, None].astype(x.dtype) * gray
    vmask = length_mask(num_vertices, v_pad, dtype=x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(vmask), 1.0)
    mean = jnp.sum(lap * vmask) / n
    return (jnp.sum(((lap - mean) ** 2) * vmask) / n)[..., None][0]


def graph_tv_and_lap_var(x, edges: EdgeSet, num_vertices):
    """Both edge metrics from ONE gather pass. On ELL-resident edge sets
    (the production hybrid layout, graph/hierarchy.py:40-49) this replaces
    the COO formulation's two [E, C] row gathers plus an [E]->[V] scatter
    (TPU-hostile: scatters serialize) with the same unrolled [V, D] slot
    gathers the model's hot path uses, sharing the gathered neighbor rows
    between TV and the Laplacian sum. Measured 8 ms/step of the flagship
    train step before, ~1 ms after (the per-step metric dict is computed
    inside the jitted train step, trainers/graph_common.py).

    Falls back to the COO formulas when no ELL tables exist. Results match
    the COO path up to f32 reduction order.
    """
    if edges.nbr is None:
        return (graph_total_variation(x, edges, num_vertices),
                graph_laplace_variance(x, edges, num_vertices))
    xf = x.astype(jnp.float32)
    gray = _grayscale(xf)
    deg_i = edges.ell_degree.astype(jnp.int32)
    tv_sum = jnp.zeros((), jnp.float32)
    s = jnp.zeros(gray.shape, jnp.float32)
    for d in range(edges.nbr.shape[1]):
        xn = xf.at[edges.nbr[:, d]].get(mode="promise_in_bounds")
        valid = (d < deg_i)[:, None]
        tv_sum = tv_sum + jnp.sum(
            jnp.where(valid, jnp.abs(xn - xf), 0.0))
        s = s + jnp.where(valid, _grayscale(xn), 0.0)
    if edges.spill_src is not None:
        # spilled edges: pad entries are trash->trash self-edges, whose TV
        # term is exactly 0 and whose Laplacian contribution lands on the
        # trash row (excluded by vmask below) — no extra masking needed.
        xs = xf.at[edges.spill_src].get(mode="promise_in_bounds")
        xd = xf.at[edges.spill_dst].get(mode="promise_in_bounds")
        tv_sum = tv_sum + jnp.sum(jnp.abs(xs - xd))
        s = s + segment_sum(_grayscale(xs), edges.spill_dst, gray.shape[0],
                            indices_are_sorted=True)
    n_v = jnp.maximum(num_vertices.astype(jnp.float32), 1.0)
    tv = (tv_sum / (n_v * x.shape[1])).astype(x.dtype)
    lap = s - edges.degree[:, None].astype(jnp.float32) * gray
    vmask = length_mask(num_vertices, gray.shape[0], jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(vmask), 1.0)
    mean = jnp.sum(lap * vmask) / n
    var = (jnp.sum(((lap - mean) ** 2) * vmask) / n).astype(x.dtype)
    return tv, var


def l1(x, y, valid_mask):
    w = valid_mask[:, None]
    n = jnp.maximum(jnp.sum(w) * x.shape[1], 1.0)
    return jnp.sum(jnp.abs(x - y) * w) / n


def mse(x, y, valid_mask):
    w = valid_mask[:, None]
    n = jnp.maximum(jnp.sum(w) * x.shape[1], 1.0)
    return jnp.sum((x - y) ** 2 * w) / n

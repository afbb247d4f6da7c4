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
    emask = edges.edge_mask(dtype=x.dtype)
    diff = jnp.abs(gather_edge_features(x, edges.src)
                   - gather_edge_features(x, edges.dst))
    tv = jnp.sum(diff * emask[:, None])
    return tv / (jnp.maximum(num_vertices.astype(x.dtype), 1.0) * x.shape[1])


def _grayscale(x):
    return 0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]


def graph_laplace_variance(x, edges: EdgeSet, num_vertices):
    """Biased variance over valid vertices of the luma graph Laplacian."""
    v_pad = edges.degree.shape[0]
    gray = _grayscale(x)
    s = segment_sum(gather_edge_features(gray, edges.src), edges.dst, v_pad,
                    indices_are_sorted=True)
    lap = s - edges.degree[:, None].astype(x.dtype) * gray
    vmask = length_mask(num_vertices, v_pad, dtype=x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(vmask), 1.0)
    mean = jnp.sum(lap * vmask) / n
    return (jnp.sum(((lap - mean) ** 2) * vmask) / n)[..., None][0]


def l1(x, y, valid_mask):
    w = valid_mask[:, None]
    n = jnp.maximum(jnp.sum(w) * x.shape[1], 1.0)
    return jnp.sum(jnp.abs(x - y) * w) / n


def mse(x, y, valid_mask):
    w = valid_mask[:, None]
    n = jnp.maximum(jnp.sum(w) * x.shape[1], 1.0)
    return jnp.sum((x - y) ** 2 * w) / n

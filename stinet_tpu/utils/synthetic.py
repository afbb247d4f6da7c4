"""Synthetic ScanNet-like mesh hierarchies for benchmarks, dry runs and
tests — mimics the statistics of the preprocessing pipeline's output
(avg degree ~6 triangle-mesh connectivity, ~30% QEM decimation per level,
dilated edge sets at the coarsest level) without requiring ScanNet data."""
from typing import Sequence

import numpy as np

from stinet_tpu.graph.build import RawHierarchy


def ring_mesh_edges(n: int, rng, extra_per_vertex: int = 4) -> np.ndarray:
    """Undirected-ish mesh-like connectivity: a ring (guarantees every vertex
    has degree >= 2) plus random local links; returned directed [2, E]."""
    ring_src = np.arange(n)
    ring_dst = (ring_src + 1) % n
    rand_src = np.repeat(np.arange(n), extra_per_vertex)
    rand_dst = (rand_src + rng.integers(1, max(n // 16, 2),
                                        size=rand_src.shape)) % n
    src = np.concatenate([ring_src, rand_src])
    dst = np.concatenate([ring_dst, rand_dst])
    und = np.stack([np.concatenate([src, dst]),
                    np.concatenate([dst, src])])
    return und


def synthetic_scene(num_vertices: int = 65536, levels: int = 3,
                    decimation: float = 0.3, input_nc: int = 10,
                    dilation_dists: Sequence[int] = (2, 4, 8, 16),
                    masked_frac: float = 0.25, seed: int = 0,
                    name: str = "synthetic") -> RawHierarchy:
    rng = np.random.default_rng(seed)
    nv = [num_vertices]
    for _ in range(levels - 1):
        nv.append(max(int(nv[-1] * decimation), 8))

    edges = [ring_mesh_edges(v, rng) for v in nv]
    traces = []
    for l in range(levels - 1):
        t = rng.integers(0, nv[l + 1], size=nv[l])
        t[:nv[l + 1]] = np.arange(nv[l + 1])  # surjective
        traces.append(t.astype(np.int64))

    dilated = {levels - 1: {
        int(d): ring_mesh_edges(nv[-1], rng, extra_per_vertex=3)
        for d in dilation_dists}}

    pos = rng.normal(size=(nv[0], 3)).astype(np.float32)
    color = rng.uniform(-1, 1, size=(nv[0], 3)).astype(np.float32)
    normals = rng.normal(size=(nv[0], 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    mask = np.zeros((nv[0], 1), np.float32)
    n_masked = int(nv[0] * masked_frac)
    mask[rng.choice(nv[0], n_masked, replace=False), 0] = rng.integers(
        1, 16, size=n_masked)
    mask_bool = (mask == 0).astype(np.float32)

    if input_nc == 10:
        x = np.concatenate([color * mask_bool, normals, pos, mask_bool], -1)
    else:
        x = rng.normal(size=(nv[0], input_nc)).astype(np.float32)

    return RawHierarchy(
        x=x.astype(np.float32), color=color, mask=mask,
        num_vertices=nv, level_edges=edges, traces=traces,
        dilated=dilated, name=name)

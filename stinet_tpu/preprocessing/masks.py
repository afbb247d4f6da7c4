"""Geodesic-disk mask generation — capability parity with the `circles` mode
of /root/reference/preprocessing/observed_texture_map_generation.py:570-650:
random seed vertices grow BFS disks of hop radius R over the level-0 mesh
adjacency; the stored mask value is max(radius - hopdist, existing) i.e. the
hop distance from the nearest observed vertex; disks are added until the
masked fraction is reached; masks under a minimum fraction are rejected;
per-graph masks are projected through the original-vertex-index channel
(vertices_0[:, 9])."""
import os
from typing import Sequence

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import dijkstra


def bfs_hop_distances(edges: np.ndarray, num_vertices: int,
                      seeds: np.ndarray, limit: float):
    adj = csr_matrix(
        (np.ones(edges.shape[1], np.int8), (edges[0], edges[1])),
        shape=(num_vertices, num_vertices))
    return dijkstra(adj, directed=False, unweighted=True, indices=seeds,
                    limit=limit)


def circle_mask(edges: np.ndarray, num_vertices: int, radius: int,
                frac_masked: float, rng: np.random.Generator,
                max_iters: int = 10000) -> np.ndarray:
    """Vertex mask: 0 = observed, >0 = hop distance from nearest observed."""
    mask = np.zeros(num_vertices, np.float32)
    target = frac_masked * num_vertices
    for _ in range(max_iters):
        if (mask > 0).sum() >= target:
            break
        seed = int(rng.integers(0, num_vertices))
        dist = bfs_hop_distances(edges, num_vertices,
                                 np.array([seed]), radius)[0]
        reach = np.isfinite(dist)
        update = np.zeros(num_vertices, np.float32)
        update[reach] = radius - dist[reach]
        mask = np.maximum(mask, update)
    return mask


def project_mask_to_graph(scene_mask: np.ndarray,
                          graph_npz_path: str) -> np.ndarray:
    """Project a full-scene vertex mask into a (possibly cropped) graph file
    via the original-index channel (reference approve_and_write_out_mask,
    observed_texture_map_generation.py:616-650)."""
    z = np.load(graph_npz_path)
    orig_idx = np.rint(z["vertices_0"][:, 9]).astype(np.int64)
    return scene_mask[np.clip(orig_idx, 0, len(scene_mask) - 1)]


def generate_masks_for_scene(scene_graph_path: str, mask_root: str,
                             mask_name: str, num_masks: int = 16,
                             radius: int = 16, frac_masked: float = 0.2,
                             min_frac: float = 0.02, seed: int = 0,
                             crop_graph_paths: Sequence[str] = ()):
    """Write masks/<mask_name>/<scene>/<i>.npz{vertex_mask} for the scene
    graph and project into crop graphs when given."""
    z = np.load(scene_graph_path)
    edges = z["edges_0"]
    nv = z["vertices_0"].shape[0]
    scene = os.path.basename(scene_graph_path).replace(".npz", "")
    rng = np.random.default_rng(seed)

    written = []
    mask_id = 0
    attempts = 0
    while mask_id < num_masks and attempts < num_masks * 4:
        attempts += 1
        mask = circle_mask(edges, nv, radius, frac_masked, rng)
        if (mask > 0).sum() < min_frac * nv:
            continue
        out_dir = os.path.join(mask_root, mask_name, scene)
        os.makedirs(out_dir, exist_ok=True)
        np.savez(os.path.join(out_dir, f"{mask_id}.npz"), vertex_mask=mask)
        written.append(os.path.join(out_dir, f"{mask_id}.npz"))
        for crop_path in crop_graph_paths:
            crop_mask = project_mask_to_graph(mask, crop_path)
            if (crop_mask > 0).sum() < min_frac * len(crop_mask):
                continue
            crop = os.path.basename(crop_path).replace(".npz", "")
            cdir = os.path.join(mask_root, mask_name, crop)
            os.makedirs(cdir, exist_ok=True)
            np.savez(os.path.join(cdir, f"{mask_id}.npz"),
                     vertex_mask=crop_mask)
        mask_id += 1
    return written

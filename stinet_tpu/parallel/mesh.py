"""Device mesh + sharding layout for multi-chip training.

The reference has no working multi-device path (SURVEY.md §2.7: DataParallel
stubs asserted off at inpainting3d_trainer.py:25). This module is the
TPU-native replacement: a `jax.sharding.Mesh` with two logical axes —

  * `data`  — the vertex/edge dimension of the batched block-diagonal graph.
    Graphs are concatenated, so sharding the vertex dim over `data` places
    whole graphs (or contiguous chunks) per device; XLA/GSPMD inserts the
    all-reduces for cross-shard segment ops and the gradient psum.
  * `model` — tensor parallelism over the hidden dimension of the wide
    per-vertex projections (the MXU matmuls that dominate FLOPs): kernels of
    shape [in, H] shard as P(None, 'model'), biases as P('model').

Collectives ride ICI; no NCCL/MPI analog exists or is needed.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % model_parallel == 0, \
        f"{n} devices not divisible by model_parallel={model_parallel}"
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def graph_sharding(graph, mesh: Mesh):
    """Sharding pytree for a HierarchicalGraph: vertex/edge-dim arrays are
    sharded over `data`, scalars replicated. Leaf dims must divide the data
    axis size — guaranteed by pad_multiple >= 128 bucketing."""
    n_data = mesh.shape["data"]

    def spec(leaf):
        leaf = np.asarray(leaf) if not hasattr(leaf, "ndim") else leaf
        if leaf.ndim >= 1 and leaf.shape[0] % n_data == 0 \
                and leaf.shape[0] >= n_data:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, graph)


def param_sharding(params, mesh: Mesh, min_dim: int = 128):
    """Tensor-parallel layout: 2D kernels with a wide output dim shard over
    `model`; everything else is replicated (pure DP when model axis == 1)."""
    n_model = mesh.shape.get("model", 1)

    def spec(leaf):
        if (n_model > 1 and leaf.ndim == 2
                and leaf.shape[1] % n_model == 0 and leaf.shape[1] >= min_dim):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)

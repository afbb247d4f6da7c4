"""HierarchicalGraph — the central data structure of the framework.

TPU-native replacement for the reference's `HierarchicalData` PyG container
(/root/reference/utils/data_utils.py:11-42). Where the reference carries
dynamically-shaped tensors plus `__inc__` batching rules, this is a pytree of
*static-shape, padded* arrays so a single XLA compilation serves every graph
in a size bucket:

  * vertices of level l live in rows [0, num_vertices[l]) of a [V_pad_l, C]
    buffer; the remaining rows are pad. Row V_pad-1 is the designated "trash"
    vertex: pad edges and pad trace entries target it.
  * edges are COO int32 pairs sorted by destination, padded with
    (V_pad-1, V_pad-1) self-edges at the tail (keeps sortedness).
  * traces map fine-level vertex v -> its coarse-level representative, the
    contract behind STINet pooling (scatter over trace, reference
    surfacetextureinpaintingnet.py:382-391); pad entries map to the coarse
    trash vertex.
  * `graph_id` assigns every vertex to its graph within the batch (pad rows
    get id == num_graphs, which segment ops drop), replacing PyG collation +
    the contiguity hacks in FastInstanceNorm/SingleBatchGraphNorm.

Scalar `num_vertices` / `num_edges` are traced int32 so one compiled program
serves all graphs of a bucket shape.
"""
from typing import Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from stinet_tpu.ops.message_passing import length_mask


@struct.dataclass
class EdgeSet:
    src: jax.Array          # [E_pad] int32, sender vertex ids, sorted by dst
    dst: jax.Array          # [E_pad] int32, receiver vertex ids (sorted)
    num_edges: jax.Array    # scalar int32, count of valid (non-pad) edges
    degree: jax.Array       # [V_pad] float32, valid in-degree per vertex
    # ELL fast path (see stinet_tpu/ops/ell.py); None when the degree
    # distribution is too skewed and COO segment ops are used instead. The
    # slot axis is capped near the p97 in-degree; edges beyond the cap spill
    # to a small COO list handled by segment ops (hybrid ELL+COO).
    nbr: jax.Array = None       # [V_pad, D_cap] int32 sender per receiver slot
    rev_dst: jax.Array = None   # [V_pad, D_out] int32 receiver per sender slot
    out_degree: jax.Array = None  # [V_pad] f32 ELL-resident out-degree
    ell_degree: jax.Array = None  # [V_pad] f32 ELL-resident in-degree
    spill_src: jax.Array = None   # [S_pad] int32 spilled edges, sorted by dst
    spill_dst: jax.Array = None   # [S_pad] int32 (pads -> trash vertex)
    # Bandwidth bound of the ELL tables on bandwidth-ordered graphs
    # (build.py: reorder_bandwidth + windowed=True): every ELL-resident edge
    # satisfies |src - dst| <= halo AND |rev_dst - src| <= halo, enabling the
    # windowed one-hot MXU kernel (ops/pallas/onehot_gather.py). Static so
    # kernel dispatch is trace-time.
    halo: int = struct.field(pytree_node=False, default=None)

    @property
    def num_padded_edges(self) -> int:
        return self.src.shape[0]

    def edge_mask(self, dtype=jnp.float32):
        return length_mask(self.num_edges, self.src.shape[0], dtype=dtype)


@struct.dataclass
class GraphLevel:
    edges: EdgeSet
    num_vertices: jax.Array   # scalar int32, valid vertex count at this level
    graph_id: jax.Array       # [V_pad] int32; pad rows = num_graphs
    # Dilated edge sets for bottleneck blocks, keyed by dilation distance
    # (reference hierarchy_dil_{d}_edge_index_{L}); static int keys.
    dilated: Mapping[int, EdgeSet] = struct.field(default_factory=dict)

    @property
    def num_padded_vertices(self) -> int:
        return self.graph_id.shape[0]

    def vertex_mask(self, dtype=jnp.float32):
        return length_mask(self.num_vertices, self.graph_id.shape[0],
                           dtype=dtype)


@struct.dataclass
class HierarchicalGraph:
    x: jax.Array                        # [V0_pad, C] input vertex features
    color: jax.Array                    # [V0_pad, 3] ground-truth colors
    mask: jax.Array                     # [V0_pad, 1] inpainting mask (0 = observed,
                                        #  >0 = hop distance from observed region)
    levels: Tuple[GraphLevel, ...]      # level 0 (finest) .. L-1 (coarsest)
    traces: Tuple[jax.Array, ...]       # traces[l]: [V_pad_l] -> level l+1 ids
    num_graphs: int = struct.field(pytree_node=False, default=1)
    labels: jax.Array = None            # [V0_pad] int32, segmentation only
    # Children tables (coarse -> fine) induced by the traces, enabling
    # gather-only pooling/unpooling (stinet_tpu/ops/ell.py); None entries
    # fall back to segment ops.
    children: Tuple = ()                # children[l]: [V_pad_{l+1}, C] int32
    child_counts: Tuple = ()            # counts[l]: [V_pad_{l+1}] float32

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    @property
    def num_vertices(self):
        """Per-level valid vertex counts (traced scalars), the analog of the
        reference's `sample.num_vertices` tensor."""
        return tuple(l.num_vertices for l in self.levels)

    def vertex_mask(self, level=0, dtype=jnp.float32):
        return self.levels[level].vertex_mask(dtype=dtype)

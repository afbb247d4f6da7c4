from stinet_tpu.graph.hierarchy import EdgeSet, GraphLevel, HierarchicalGraph
from stinet_tpu.graph.build import (
    build_hierarchical_graph,
    batch_hierarchies,
    grid_hierarchy,
    bucket_size,
)

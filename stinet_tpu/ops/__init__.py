from stinet_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_count,
)
from stinet_tpu.ops.message_passing import (
    edge_conv_aggregate,
    gather_edge_features,
    graph_laplacian,
)
from stinet_tpu.ops.norms import (
    masked_instance_norm,
    masked_graph_norm,
    masked_batch_norm_stats,
)
from stinet_tpu.ops.ell import (
    ell_edge_conv_sum,
    ell_edge_conv_mean,
    ell_neighbor_mean,
    ell_pool_mean,
    ell_pool_max,
    ell_unpool,
)

from stinet_tpu.metrics.graph_metrics import (
    psnr, masked_psnr, graph_total_variation, graph_laplace_variance)
from stinet_tpu.metrics.tracker import MetricTracker

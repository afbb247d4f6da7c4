"""SingleConvMeshNet — geodesic U-Net for mesh semantic segmentation.

Capability parity with /root/reference/models/singleconvmeshnet.py: per level
a ResBlock of `num_propagation_steps` EdgeConvs whose inner MLPs carry
BatchNorm (bias-free linears, edge_conv_filter.py:35-44 with_norm path),
additive residuals with post-activation, trace pooling on the encoder,
gather-unpool + skip-concat on the decoder, and a Lin->BN->ReLU->Lin head.

TPU notes: messages use the same per-vertex P/Q decomposition as STINet for
the first linear; the BatchNorms need per-edge statistics, so the normalized
message tensor is materialized per edge set (masked over valid edges) —
XLA fuses the surrounding elementwise work; a Pallas two-pass kernel is the
planned upgrade for this filter family.
"""
from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from stinet_tpu.graph.hierarchy import EdgeSet, HierarchicalGraph
from stinet_tpu.models.stinet import Dense, torch_linear_init
from stinet_tpu.ops.message_passing import gather_edge_features
from stinet_tpu.ops.segment import segment_mean, segment_max


class _MaskedEdgeBatchNorm(nn.Module):
    """BatchNorm1d over the edge/message dimension, ignoring pad edges."""
    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, m, edge_mask, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        if train:
            w = edge_mask[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(m * w, axis=0) / n
            var = jnp.sum(((m - mean) * w) ** 2, axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        return (m - mean) / jnp.sqrt(var + self.eps) * scale + bias


class EdgeConvWithNorm(nn.Module):
    """EdgeConv whose inner MLP is Lin(2H, no bias) -> BN -> ReLU ->
    Lin(H, no bias) -> BN, aggregated by mean/max at the receiver."""
    in_features: int
    out_features: int
    trans_inv: bool = False
    aggr: str = "mean"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edges: EdgeSet, train: bool = False):
        hidden = 2 * self.out_features
        c = self.in_features
        if self.trans_inv:
            w1 = self.param("lin1_kernel", torch_linear_init, (c, hidden))
            xw = x @ w1
            p, q = -xw, xw
        else:
            w1 = self.param("lin1_kernel", torch_linear_init,
                            (2 * c, hidden))
            wi, wd = w1[:c], w1[c:]
            p, q = x @ (wi - wd), x @ wd

        emask = edges.edge_mask(dtype=x.dtype)
        m = gather_edge_features(p, edges.dst) + \
            gather_edge_features(q, edges.src)
        m = _MaskedEdgeBatchNorm(hidden, name="bn1")(m, emask, train)
        m = nn.relu(m)
        w2 = self.param("lin2_kernel", torch_linear_init,
                        (hidden, self.out_features))
        y = m @ w2
        y = _MaskedEdgeBatchNorm(self.out_features, name="bn2")(
            y, emask, train)
        y = y * emask[:, None]  # zero pad-edge messages before aggregation
        v_pad = edges.degree.shape[0]
        if self.aggr == "mean":
            return segment_mean(y, edges.dst, v_pad, indices_are_sorted=True,
                                counts=edges.degree.astype(x.dtype))
        return segment_max(y, edges.dst, v_pad, indices_are_sorted=True)


class MeshResBlock(nn.Module):
    """num_propagation_steps EdgeConvs with additive residuals and
    post-activation (reference singleconvmeshnet.py:94-108)."""
    in_features: int
    out_features: int
    num_steps: int
    first_trans_inv: bool = False
    aggr: str = "mean"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edges: EdgeSet, train: bool = False):
        h = EdgeConvWithNorm(self.in_features, self.out_features,
                             trans_inv=self.first_trans_inv, aggr=self.aggr,
                             dtype=self.dtype, name="filter_0")(
            x, edges, train)
        h = nn.relu(h)
        for step in range(1, self.num_steps):
            r = EdgeConvWithNorm(self.out_features, self.out_features,
                                 aggr=self.aggr, dtype=self.dtype,
                                 name=f"filter_{step}")(h, edges, train)
            h = nn.relu(h + r)
        return h


class SingleConvMeshNet(nn.Module):
    """U-Net over the mesh hierarchy; `filter_sizes` defines the levels."""
    feature_number: int
    num_propagation_steps: int
    filter_sizes: Sequence[int]
    num_classes: int = 21
    pooling_method: str = "mean"
    aggr: str = "mean"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g: HierarchicalGraph, train: bool = False):
        fs = list(self.filter_sizes)
        L = len(fs)
        Block = nn.remat(MeshResBlock, static_argnums=(3,))

        def pool(x, trace, coarse_size):
            if self.pooling_method == "mean":
                return segment_mean(x, trace, coarse_size)
            if self.pooling_method == "max":
                return segment_max(x, trace, coarse_size)
            raise ValueError(self.pooling_method)

        levels = [MeshResBlock(self.feature_number, fs[0],
                               self.num_propagation_steps,
                               first_trans_inv=True, aggr=self.aggr,
                               dtype=self.dtype, name="left_0")(
            g.x, g.levels[0].edges, train)]

        for level in range(1, L):
            cur = pool(levels[-1], g.traces[level - 1],
                       g.levels[level].num_padded_vertices)
            cur = Block(fs[level - 1], fs[level],
                        self.num_propagation_steps, aggr=self.aggr,
                        dtype=self.dtype, name=f"left_{level}")(
                cur, g.levels[level].edges, train)
            levels.append(cur)

        current = levels[-1]
        for i in range(1, L):
            fine = L - i - 1
            back = current.at[g.traces[fine]].get(mode="promise_in_bounds")
            fused = jnp.concatenate([levels[fine], back], axis=-1)
            current = Block(fs[fine] + fs[fine + 1], fs[fine],
                            self.num_propagation_steps, aggr=self.aggr,
                            dtype=self.dtype, name=f"right_{fine}")(
                fused, g.levels[fine].edges, train)

        h = Dense(fs[0] // 2, dtype=self.dtype, name="head_lin1")(current)
        # head BatchNorm over valid vertices
        vmask = g.levels[0].vertex_mask(dtype=h.dtype)
        h = _MaskedEdgeBatchNorm(fs[0] // 2, name="head_bn")(h, vmask, train)
        h = nn.relu(h)
        return Dense(self.num_classes, dtype=self.dtype,
                     name="head_lin2")(h)

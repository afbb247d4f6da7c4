"""SurfaceTextureInpaintingNet — the flagship model, TPU-native.

Capability parity with the reference graph ResNet encoder–decoder
(/root/reference/models/surfacetextureinpaintingnet.py:202-521): input blocks,
trace-map pooling encoder, dilated-edge bottleneck, gather-unpooling decoder,
and the Linear→norm→ELU→Linear→Tanh head. The computation is re-derived for
TPU (see stinet_tpu/ops/message_passing.py): every EdgeConv is two dense
per-vertex MXU matmuls plus a gather/add/relu/segment-mean edge pass, instead
of per-edge MLPs.

Activation checkpointing uses nn.remat on blocks, mirroring the reference's
torch.utils.checkpoint placement (encoder/decoder blocks always, bottleneck
blocks when `checkpoint_bottleneck`, surfacetextureinpaintingnet.py:429-455).
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from stinet_tpu.graph.hierarchy import EdgeSet, GraphLevel, HierarchicalGraph
from stinet_tpu.ops.message_passing import (
    edge_conv_aggregate, neighbor_aggregate)
from stinet_tpu.ops.norms import (
    masked_instance_norm, masked_graph_norm, masked_batch_norm_stats)
from stinet_tpu.ops.segment import segment_mean, segment_max

# torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)); biases are zeroed by the reference's
# init_weights pass (surfacetextureinpaintingnet.py:360-374).
torch_linear_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


class Dense(nn.Dense):
    """nn.Dense with torch-compatible default init."""
    kernel_init: nn.initializers.Initializer = torch_linear_init
    bias_init: nn.initializers.Initializer = nn.initializers.zeros


class GraphNormLayer(nn.Module):
    """Norm dispatcher: batch | instance | graph | none, masked/per-graph.

    Mirrors the reference's norm selection (surfacetextureinpaintingnet.py:
    243-263): 'instance' -> FastInstanceNorm (affine=False, no running stats),
    'graph' -> SingleBatchGraphNorm (learned weight/bias/mean_scale),
    'batch' -> PyG BatchNorm over the node dimension (affine, running stats).
    """
    features: int
    norm_type: str = "instance"
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, level: GraphLevel, num_graphs: int,
                 train: bool = False):
        # norm statistics in >= f32 (bf16 means over 10^5 rows drift)
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
        vmask = level.vertex_mask(dtype=x.dtype)
        if self.norm_type == "none":
            return x.astype(in_dtype)
        if self.norm_type == "instance":
            # the Pallas two-pass kernel (ops/pallas/instance_norm.py) was
            # measured SLOWER on v5e (2.10-2.15 ms vs XLA 1.19-1.97 ms at
            # V=65k/H=128 — ops/pallas/README.md); it stays as a documented
            # experiment, not a production dispatch path.
            return masked_instance_norm(
                x, level.graph_id, num_graphs, vmask,
                eps=self.eps).astype(in_dtype)
        if self.norm_type == "graph":
            weight = self.param("weight", nn.initializers.ones,
                                (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            mean_scale = self.param("mean_scale", nn.initializers.ones,
                                    (self.features,))
            return masked_graph_norm(
                x, level.graph_id, num_graphs, vmask, weight, bias,
                mean_scale, eps=self.eps).astype(in_dtype)
        if self.norm_type == "batch":
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros(self.features))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones(self.features))
            if train:
                mean, var = masked_batch_norm_stats(x, vmask)
                n = jnp.maximum(jnp.sum(vmask), 2.0)
                unbiased = var * n / (n - 1.0)
                if not self.is_initializing():
                    ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                     + self.momentum * mean)
                    ra_var.value = ((1 - self.momentum) * ra_var.value
                                    + self.momentum * unbiased)
            else:
                mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.eps)
            return (((x - mean) * inv * scale + bias)
                    * vmask[:, None]).astype(in_dtype)
        raise NotImplementedError(f"norm type {self.norm_type!r}")


class EdgeConvFilter(nn.Module):
    """EdgeConv / EdgeConvTransInv with inner MLP Lin(2H)->ReLU->Lin(H_out).

    Algebraic form (module docstring of ops/message_passing.py):
        EdgeConv:        P = x (W_i - W_d) + b1, Q = x W_d
        EdgeConvTransInv: P = -x W + b1,        Q = x W
        out = Lin2( aggr_e relu(P[dst_e] + Q[src_e]) )
    Weight shapes match the reference filters (edge_conv_filter.py:46-57) so
    checkpoints are convertible 1:1 (torch [out,in] <-> here [in,out]).
    """
    in_features: int
    out_features: int
    trans_inv: bool = False
    aggr: str = "mean"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edges: EdgeSet):
        hidden = 2 * self.out_features
        c = self.in_features
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        if self.trans_inv:
            w1 = self.param("lin1_kernel", torch_linear_init, (c, hidden))
            b1 = (self.param("lin1_bias", nn.initializers.zeros,
                             (hidden,)).astype(dt)
                  if self.use_bias else jnp.zeros((), dt))
            xw = x @ w1.astype(dt)
            p, q = b1 - xw, xw
        else:
            w1 = self.param("lin1_kernel", torch_linear_init, (2 * c, hidden))
            b1 = (self.param("lin1_bias", nn.initializers.zeros,
                             (hidden,)).astype(dt)
                  if self.use_bias else jnp.zeros((), dt))
            wi, wd = w1[:c].astype(dt), w1[c:].astype(dt)
            p = x @ (wi - wd) + b1
            q = x @ wd
        agg = edge_conv_aggregate(
            p, q, edges.src, edges.dst,
            num_segments=edges.degree.shape[0], aggr=self.aggr,
            degree=edges.degree.astype(dt) if self.aggr == "mean" else None,
            nbr=edges.nbr, rev_dst=edges.rev_dst,
            out_degree=edges.out_degree, ell_degree=edges.ell_degree,
            spill_src=edges.spill_src, spill_dst=edges.spill_dst,
            halo=edges.halo)
        return Dense(self.out_features, use_bias=self.use_bias,
                     dtype=dt, name="lin2")(agg)


class SageConvFilter(nn.Module):
    """GraphSAGE filter family (reference models/modules/sage_conv_filter.py):
    out = lin_l(mean_j x_j) + lin_r(x_i). The trans-inv variant subtracts the
    receiver's channels 3:9 (normals+positions in the 10ch layout) from the
    sender's before aggregation (sage_conv_filter.py:87-90); since that shift
    is constant in the receiver it commutes with the mean."""
    in_features: int
    out_features: int
    trans_inv: bool = False
    aggr: str = "mean"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edges: EdgeSet):
        dt = self.dtype or x.dtype
        agg = neighbor_aggregate(
            x, edges.src, edges.dst, num_segments=edges.degree.shape[0],
            aggr=self.aggr,
            degree=edges.degree.astype(dt) if self.aggr == "mean" else None)
        if self.trans_inv and self.in_features >= 9:
            shift = jnp.zeros_like(x).at[:, 3:9].set(x[:, 3:9])
            agg = agg - shift
        out = Dense(self.out_features, use_bias=self.use_bias, dtype=dt,
                    name="lin_l")(agg)
        out = out + Dense(self.out_features, use_bias=False, dtype=dt,
                          name="lin_r")(x)
        return out


def make_filter(filter_type: str, dim_in: int, dim_out: int, first: bool,
                aggr: str = "mean", dtype=None, name=None):
    """Filter factory mirroring define_G's filter_type dispatch
    (surfacetextureinpaintingnet.py:229-306). The trans-inv variant is only
    used for the very first conv (absolute positions must not leak)."""
    if filter_type in ("edgeconv", "edgeconvtransinv"):
        return EdgeConvFilter(
            dim_in, dim_out,
            trans_inv=(filter_type == "edgeconvtransinv" and first),
            aggr=aggr, dtype=dtype, name=name)
    if filter_type in ("sageconv", "sageconvtransinv"):
        return SageConvFilter(
            dim_in, dim_out,
            trans_inv=(filter_type == "sageconvtransinv" and first),
            aggr=aggr, dtype=dtype, name=name)
    raise NotImplementedError(f"filter type {filter_type!r}")


class GraphResnetBlock(nn.Module):
    """filter -> norm -> ELU + (linear-projected) residual
    (reference GraphResnetBlock, surfacetextureinpaintingnet.py:474-521)."""
    dim_in: int
    dim_out: int
    filter_type: str
    norm_type: str = "instance"
    first: bool = False
    aggr: str = "mean"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edges: EdgeSet, level: GraphLevel,
                 num_graphs: int = 1, train: bool = False):
        out = make_filter(self.filter_type, self.dim_in, self.dim_out,
                          self.first, self.aggr, self.dtype,
                          name="first_filter")(x, edges)
        out = GraphNormLayer(self.dim_out, self.norm_type,
                             name="first_norm")(out, level, num_graphs, train)
        out = nn.elu(out)
        if self.dim_in != self.dim_out:
            x = Dense(self.dim_out, dtype=self.dtype, name="shortcut")(x)
        return x + out


def _pool(x, trace, coarse_size, pooling_type, children=None, counts=None):
    """Encoder pooling: mean/max of fine features over the trace map
    (reference _pooling, surfacetextureinpaintingnet.py:382-388). Uses the
    gather-only children-table path when available, else segment ops (pad
    fine rows trace to the coarse trash vertex, so no masking is needed)."""
    if children is not None:
        from stinet_tpu.ops.ell import ell_pool_mean, ell_pool_max
        fn = ell_pool_mean if pooling_type == "mean" else ell_pool_max
        return fn(x, trace, children, counts)
    if pooling_type == "mean":
        return segment_mean(x, trace, coarse_size)
    if pooling_type == "max":
        return segment_max(x, trace, coarse_size)
    raise ValueError(f"Unknown pooling type {pooling_type!r}")


class SurfaceTextureInpaintingNet(nn.Module):
    """See module docstring. Config keys match the reference define_G args
    (experiments/3d_inpainting/config/*.json archs section)."""
    input_nc: int
    output_nc: int = 3
    ngf: int = 64
    filter_type: str = "edgeconvtransinv"
    norm: str = "instance"
    n_blocks: int = 6
    n_levels: int = 2
    n_repeated_io_convs: int = 1
    pooling_type: str = "max"
    dilations: Optional[Sequence[int]] = None
    checkpoint_bottleneck: bool = False
    num_blocks_per_uncheckpointed_block: int = 1
    remat_io_blocks: bool = True
    # Semantic-label conditioning: embed g.labels and concat AFTER the input
    # blocks, widening the first ENCODER block — the reference's intended
    # wiring (surfacetextureinpaintingnet.py:277-278 builds the embedding,
    # :322-323 widens encoder block 0's in_size by num_embedding, :409-410
    # holds the commented concat after the input blocks). The reference
    # never activates it; here the path is ACTIVE and torch-parity:
    # padding_idx=0 rows embed to zeros and get no gradient.
    use_label_embedding: bool = False
    num_classes: Optional[int] = None
    num_embedding: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, g: HierarchicalGraph, train: bool = False):
        dilations = (list(self.dilations) if self.dilations is not None
                     else [1] * self.n_blocks)
        assert len(dilations) == self.n_blocks
        ngf, L = self.ngf, self.n_levels
        # __call__(self, x, edges, level, num_graphs, train): the last two are
        # python scalars and must be static under jax.checkpoint.
        Block = (nn.remat(GraphResnetBlock, static_argnums=(4, 5))
                 if self.remat_io_blocks else GraphResnetBlock)

        out = g.x
        # --- input blocks (first one translation-invariant if configured)
        for i in range(self.n_repeated_io_convs):
            dim_out = ngf if i == self.n_repeated_io_convs - 1 else self.input_nc
            out = Block(self.input_nc, dim_out, self.filter_type, self.norm,
                        first=(i == 0), dtype=self.dtype,
                        name=f"input_block_{i}")(
                out, g.levels[0].edges, g.levels[0], g.num_graphs, train)

        if self.use_label_embedding:
            # concat after the input blocks; encoder block 0 widens
            # (reference :322-323, :409-410)
            assert g.labels is not None, \
                "use_label_embedding requires graph.labels"
            emb = nn.Embed(self.num_classes, self.num_embedding,
                           dtype=self.dtype, name="label_embedding")(
                g.labels.astype(jnp.int32))
            # torch nn.Embedding(padding_idx=0): label 0 embeds to zeros
            emb = emb * (g.labels != 0).astype(emb.dtype)[:, None]
            out = jnp.concatenate([out, emb.astype(out.dtype)], axis=-1)

        # --- encoder: pool over traces, then a block on the coarser edges
        for i in range(L):
            mult = 2 ** i
            in_nc = ngf * mult
            if i == 0 and self.use_label_embedding:
                in_nc += self.num_embedding
            lvl = g.levels[i + 1]
            out = _pool(out, g.traces[i], lvl.num_padded_vertices,
                        self.pooling_type,
                        g.children[i] if g.children else None,
                        g.child_counts[i] if g.children else None)
            out = Block(in_nc, ngf * mult * 2, self.filter_type,
                        self.norm, dtype=self.dtype,
                        name=f"encoder_block_{i}")(
                out, lvl.edges, lvl, g.num_graphs, train)

        # --- bottleneck on the coarsest level; dilated edge sets widen the
        # receptive field (reference surfacetextureinpaintingnet.py:431-440)
        mult = 2 ** L
        coarse = g.levels[L]
        BottleneckBlock = (nn.remat(GraphResnetBlock, static_argnums=(4, 5))
                           if self.checkpoint_bottleneck else GraphResnetBlock)
        for i in range(self.n_blocks):
            d = int(dilations[i])
            edges = coarse.dilated[d] if d > 1 else coarse.edges
            use_remat = (self.checkpoint_bottleneck and
                         (i + 1) % self.num_blocks_per_uncheckpointed_block == 0)
            B = BottleneckBlock if use_remat else GraphResnetBlock
            out = B(ngf * mult, ngf * mult, self.filter_type, self.norm,
                    dtype=self.dtype, name=f"bottleneck_block_{i}")(
                out, edges, coarse, g.num_graphs, train)

        # --- decoder: gather-unpool + block on the finer edge set
        for i in range(L):
            mult = 2 ** (L - i)
            fine_idx = L - i - 1
            fine = g.levels[fine_idx]
            # unpool: fine vertex v copies its coarse representative's row
            # (reference _unpooling, surfacetextureinpaintingnet.py:390-391);
            # children-table custom VJP keeps the backward a gather too
            if g.children and g.children[fine_idx] is not None:
                from stinet_tpu.ops.ell import ell_unpool
                out = ell_unpool(out, g.traces[fine_idx],
                                 g.children[fine_idx],
                                 g.child_counts[fine_idx])
            else:
                out = out.at[g.traces[fine_idx]].get(
                    mode="promise_in_bounds")
            out = Block(ngf * mult, ngf * mult // 2, self.filter_type,
                        self.norm, dtype=self.dtype,
                        name=f"decoder_block_{i}")(
                out, fine.edges, fine, g.num_graphs, train)

        # --- output blocks + head
        for i in range(self.n_repeated_io_convs):
            out = Block(ngf, ngf, self.filter_type, self.norm,
                        dtype=self.dtype, name=f"output_block_{i}")(
                out, g.levels[0].edges, g.levels[0], g.num_graphs, train)

        out = Dense(ngf, dtype=self.dtype, name="final_linear1")(out)
        out = GraphNormLayer(ngf, self.norm, name="final_norm1")(
            out, g.levels[0], g.num_graphs, train)
        out = nn.elu(out)
        out = Dense(self.output_nc, dtype=self.dtype, name="final_linear2")(out)
        return jnp.tanh(out)

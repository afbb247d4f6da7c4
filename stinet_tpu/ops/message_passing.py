"""The hot op of the framework: EdgeConv-style message passing, TPU-first.

Reference semantics (NOT the reference implementation): PyG EdgeConv with an
inner MLP `Seq(Lin(2C->2H), ReLU, Lin(2H->H))` and mean aggregation
(/root/reference/models/modules/edge_conv_filter.py:46-57), messages
`nn([x_i, x_j - x_i])` aggregated at the receiver i, plus the
translation-invariant first-layer variant `nn([x_j - x_i])`
(/root/reference/models/modules/edge_conv_translation_invariance.py:19-21).

TPU-native refactor
-------------------
Writing Lin1's weight as [W_i; W_d] (receiver block, difference block):

    Lin1([x_i, x_j - x_i]) = x_i W_i + (x_j - x_i) W_d + b
                           = x_i (W_i - W_d) + x_j W_d + b
                           =: P[i] + Q[j]         (P absorbs the bias)

and Lin2 commutes with the mean, so

    EdgeConv(x)_i = Lin2( mean_{j in N(i)} relu(P[i] + Q[j]) )

P and Q are *dense per-vertex matmuls* ([V, C] x [C, 2H]) that run on the MXU
at full tilt; the only per-edge work is gather + add + relu + segment-mean —
pure VPU/bandwidth work handled here. The same kernel serves the
translation-invariant variant with P = -xW + b, Q = xW. FLOPs scale with V,
not E (the reference pays the 2C->2H matmul once per *edge*).

This module implements only the per-edge part; the dense matmuls live in the
Flax modules (stinet_tpu/models/stinet.py).
"""
import os

import jax
import jax.numpy as jnp

from stinet_tpu.ops.segment import segment_mean, segment_max, segment_sum, segment_count


def length_mask(n, size, dtype=jnp.float32):
    """[size] mask: 1.0 for rows < n (valid), 0.0 for pad rows."""
    return (jax.lax.broadcasted_iota(jnp.int32, (size,), 0) < n).astype(dtype)


def gather_edge_features(x, idx):
    """x[idx] — per-edge gather of vertex rows; kept as a named op so the
    Pallas replacement can slot in without touching model code. Graph
    builders guarantee in-bounds indices, so skip XLA's OOB masking."""
    return x.at[idx].get(mode="promise_in_bounds")


def _windowed_kernel_applies(p, halo):
    """Static dispatch test for the windowed one-hot MXU kernel
    (ops/pallas/onehot_gather.py): banded ELL tables (halo), bf16 compute
    (one-hot selection is exact on bf16 rows; f32 models keep the gather
    path so headline numerics are untouched), and a shape where the kernel
    measured faster than XLA's row gather on the v5e (bench_pallas.py
    windowed_onehot rows): at the flagship mesh tables (D=6, halo<=256)
    it wins 1.3-5x fwd and 1.2-1.5x fwd+bwd for H=128 AND H=256; at
    H=256/halo=512 and at H=512 the one-hot MXU flops (~ W*H per row)
    outgrow the shrinking gather traffic and it loses — hence the
    H-dependent halo cap.

    Caps were re-tightened from full-model A/B on hostile QEM scene
    families (bench_windowed_ab.py; memory lesson: op microbenchmarks
    mislead): at terrain's halo=768 the bf16 windowed full model measured
    13.38 ms vs 10.7 ms for plain f32 — the old H=128 cap of 2048 (tuned
    on grid meshes whose halos never exceed 256) shipped the kernel far
    past its win region. Override per shape with
    STINET_WINDOWED_CAPS="bf16:128=512,f32:256=0" (cap 0 disables) when
    sweeping a new mesh family with bench_windowed_ab.py."""
    v, h = p.shape
    if halo is None or v % 128 != 0:
        return False
    # Pallas only pays off compiled-for-TPU; on CPU/GPU the kernel would
    # run in INTERPRET mode — orders of magnitude slower than the XLA
    # gather fallback. Tests opt in via STINET_WINDOWED_INTERPRET=1
    # (exact match: "0" must mean disabled, like every other repo knob).
    if (jax.default_backend() != "tpu"
            and os.environ.get("STINET_WINDOWED_INTERPRET") != "1"):
        return False
    caps = _halo_caps()
    if p.dtype == jnp.bfloat16:
        return halo <= caps.get(("bf16", h), 0)
    if p.dtype == jnp.float32:
        # exact bf16x3-plane variant (bit-identical forward at the op
        # level, XLA backward): only H=256 wins consistently (1.4-1.6x);
        # H=128 is op-parity but LOSES in the fused model (Pallas call
        # boundaries + plane-split traffic: full-model 12.3 vs 8.9 ms with
        # all shapes enabled), H=512's window VMEM cost isn't paid back
        return halo <= caps.get(("f32", h), 0)
    return False


# Measured win regions (v5e, full-model A/B): grid family (halos <= 256)
# wins for bf16 H=128/H=256 and exact-f32 H=256; terrain (halo 768) loses.
_DEFAULT_HALO_CAPS = {("bf16", 128): 384, ("bf16", 256): 384,
                      ("f32", 256): 384}


def _halo_caps():
    spec = os.environ.get("STINET_WINDOWED_CAPS")
    if not spec:
        return _DEFAULT_HALO_CAPS
    caps = dict(_DEFAULT_HALO_CAPS)
    for item in spec.split(","):
        key, _, val = item.strip().partition("=")
        dt, _, hs = key.partition(":")
        caps[(dt.strip(), int(hs))] = int(val)
    return caps


def edge_conv_aggregate(p, q, src, dst, num_segments, aggr="mean",
                        activation=jax.nn.relu, indices_are_sorted=True,
                        degree=None, nbr=None, rev_dst=None,
                        out_degree=None, ell_degree=None, spill_src=None,
                        spill_dst=None, halo=None):
    """out[i] = reduce_{e: dst[e]==i} activation(p[dst[e]] + q[src[e]]).

    p, q: [V_pad, H] precomputed per-vertex projections (see module docstring).
    src, dst: [E_pad] int32, sorted by dst; pad edges point both ends at a pad
        vertex so their messages land in pad rows and never contaminate valid
        output (graph builders guarantee this, stinet_tpu/graph/build.py).
    degree: optional [V_pad] precomputed valid in-degree (for aggr='mean');
        computed from dst when omitted.
    nbr/rev_dst/out_degree/ell_degree/spill_*: optional hybrid ELL tables —
        when present (and aggr='mean', relu), the scatter-free fast path in
        stinet_tpu/ops/ell.py handles the capped slot axis and a small COO
        segment-sum handles the spilled high-degree tail.
    halo: optional static bandwidth bound of the ELL tables (bandwidth-
        ordered graphs, build.py windowed=True): bf16 models then use the
        windowed one-hot MXU kernel instead of row gathers.
    """
    if (nbr is not None and aggr == "mean" and degree is not None
            and activation is jax.nn.relu):
        ell_deg = degree if ell_degree is None else ell_degree
        if _windowed_kernel_applies(p, halo):
            from stinet_tpu.ops.pallas.onehot_gather import (
                windowed_ell_edge_conv_sum, windowed_ell_edge_conv_sum_f32)
            fn = (windowed_ell_edge_conv_sum_f32
                  if p.dtype == jnp.float32 else windowed_ell_edge_conv_sum)
            tile = 256 if p.shape[0] % 256 == 0 else 128
            interpret = jax.default_backend() != "tpu"
            out = fn(halo, tile, interpret, p, q, nbr, rev_dst, ell_deg,
                     out_degree)
        else:
            from stinet_tpu.ops.ell import ell_edge_conv_sum
            out = ell_edge_conv_sum(p, q, nbr, rev_dst, ell_deg, out_degree)
        if spill_src is not None:
            m = activation(gather_edge_features(p, spill_dst)
                           + gather_edge_features(q, spill_src))
            # scatter-add in >= f32: sub-f32 scatter accumulation serializes
            # on TPU (and loses precision)
            m32 = m.astype(jnp.promote_types(m.dtype, jnp.float32))
            out = out + segment_sum(m32, spill_dst, num_segments,
                                    indices_are_sorted=True).astype(out.dtype)
        acc_dt = jnp.promote_types(p.dtype, jnp.float32)
        inv = 1.0 / jnp.maximum(degree.astype(acc_dt), 1.0)
        return (out.astype(acc_dt) * inv[:, None]).astype(p.dtype)
    m = activation(gather_edge_features(p, dst) + gather_edge_features(q, src))
    if aggr == "mean":
        return segment_mean(m, dst, num_segments,
                            indices_are_sorted=indices_are_sorted,
                            counts=degree)
    if aggr == "max":
        return segment_max(m, dst, num_segments,
                           indices_are_sorted=indices_are_sorted)
    if aggr in ("sum", "add"):
        return segment_sum(m, dst, num_segments,
                           indices_are_sorted=indices_are_sorted)
    raise ValueError(f"Unknown aggregation {aggr!r}")


def neighbor_aggregate(x, src, dst, num_segments, aggr="mean",
                       indices_are_sorted=True, degree=None):
    """out[i] = reduce_{e: dst[e]==i} x[src[e]] — plain neighborhood
    aggregation (used by the SAGEConv filter family and metrics)."""
    m = gather_edge_features(x, src)
    if aggr == "mean":
        return segment_mean(m, dst, num_segments,
                            indices_are_sorted=indices_are_sorted,
                            counts=degree)
    if aggr == "max":
        return segment_max(m, dst, num_segments,
                           indices_are_sorted=indices_are_sorted)
    if aggr in ("sum", "add"):
        return segment_sum(m, dst, num_segments,
                           indices_are_sorted=indices_are_sorted)
    raise ValueError(f"Unknown aggregation {aggr!r}")


def graph_laplacian(x, src, dst, num_segments, indices_are_sorted=True):
    """L(x)_i = sum_{j in N(i)} x_j - deg(i) * x_i.

    Parity with the reference's GraphLaplaceOperator
    (/root/reference/utils/metrics/graph_metrics.py:6-16) which sums an
    all-ones channel to obtain the degree.
    """
    s = segment_sum(gather_edge_features(x, src), dst, num_segments,
                    indices_are_sorted=indices_are_sorted)
    deg = segment_count(dst, num_segments,
                        indices_are_sorted=indices_are_sorted, dtype=x.dtype)
    return s - deg[:, None] * x

"""EdgeConv algebraic refactor vs a dense torch reference.

The torch model below implements PyG EdgeConv semantics directly (gather both
endpoints, run the 2-layer MLP per edge, mean per receiver) — written here
from the published EdgeConv definition, used as a golden oracle for the
TPU-native per-vertex-matmul + edge-aggregate decomposition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from stinet_tpu.ops import edge_conv_aggregate, graph_laplacian
from stinet_tpu.ops.message_passing import neighbor_aggregate


def dense_edgeconv_torch(x, src, dst, w1, b1, w2, b2, trans_inv=False):
    """EdgeConv forward in torch: out_i = Lin2(mean_j relu(Lin1(cat)))."""
    xt = torch.from_numpy(x)
    xi = xt[dst]          # receiver features
    xj = xt[src]          # sender features
    feat = (xj - xi) if trans_inv else torch.cat([xi, xj - xi], dim=1)
    m = torch.relu(feat @ torch.from_numpy(w1) + torch.from_numpy(b1))
    m = m @ torch.from_numpy(w2) + torch.from_numpy(b2)
    out = torch.zeros((x.shape[0], m.shape[1]), dtype=m.dtype)
    cnt = torch.zeros(x.shape[0], dtype=m.dtype)
    out.index_add_(0, torch.from_numpy(dst), m)
    cnt.index_add_(0, torch.from_numpy(dst), torch.ones(len(dst)))
    return (out / cnt.clamp(min=1).unsqueeze(1)).numpy()


def random_graph(rng, v=50, e=300):
    src = rng.integers(0, v, size=e).astype(np.int64)
    dst = rng.integers(0, v, size=e).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order]


def test_edgeconv_decomposition_matches_dense(rng):
    v, e, c, h, cout = 50, 300, 6, 16, 8
    x = rng.normal(size=(v, c)).astype(np.float32)
    src, dst = random_graph(rng, v, e)
    w1 = rng.normal(size=(2 * c, h)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(h,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(h, cout)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(cout,)).astype(np.float32) * 0.1

    want = dense_edgeconv_torch(x, src, dst, w1, b1, w2, b2)

    # TPU path: P = x (W_i - W_d) + b1, Q = x W_d; Lin2 after aggregation.
    wi, wd = w1[:c], w1[c:]
    p = x @ (wi - wd) + b1
    q = x @ wd
    agg = edge_conv_aggregate(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(src.astype(np.int32)),
                              jnp.asarray(dst.astype(np.int32)),
                              num_segments=v)
    got = np.asarray(agg) @ w2 + b2
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_edgeconv_transinv_decomposition(rng):
    """nn(x_j - x_i) variant: P = -xW + b, Q = xW."""
    v, e, c, h, cout = 40, 200, 10, 12, 5
    x = rng.normal(size=(v, c)).astype(np.float32)
    src, dst = random_graph(rng, v, e)
    w1 = rng.normal(size=(c, h)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(h,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(h, cout)).astype(np.float32) * 0.3
    b2 = np.zeros(cout, dtype=np.float32)

    want = dense_edgeconv_torch(x, src, dst, w1, b1, w2, b2, trans_inv=True)

    xw = x @ w1
    agg = edge_conv_aggregate(jnp.asarray(-xw + b1), jnp.asarray(xw),
                              jnp.asarray(src.astype(np.int32)),
                              jnp.asarray(dst.astype(np.int32)),
                              num_segments=v)
    got = np.asarray(agg) @ w2 + b2
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_padded_edges_do_not_contaminate(rng):
    """Pad edges target the trash vertex; valid rows must be unchanged."""
    v, e, h = 20, 80, 8
    p = rng.normal(size=(v, h)).astype(np.float32)
    q = rng.normal(size=(v, h)).astype(np.float32)
    src, dst = random_graph(rng, v - 1, e)  # all edges among valid vertices
    base = np.asarray(edge_conv_aggregate(
        jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(src.astype(np.int32)), jnp.asarray(dst.astype(np.int32)),
        num_segments=v))

    trash = v - 1
    src_p = np.concatenate([src, np.full(16, trash)]).astype(np.int32)
    dst_p = np.concatenate([dst, np.full(16, trash)]).astype(np.int32)
    padded = np.asarray(edge_conv_aggregate(
        jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(src_p), jnp.asarray(dst_p), num_segments=v))
    np.testing.assert_allclose(padded[:trash], base[:trash], rtol=1e-6)


def test_graph_laplacian_matches_reference_formula(rng):
    v, e = 30, 120
    x = rng.normal(size=(v, 1)).astype(np.float32)
    src, dst = random_graph(rng, v, e)
    got = np.asarray(graph_laplacian(
        jnp.asarray(x), jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)), v))
    want = np.zeros_like(x)
    deg = np.zeros(v)
    for s, d in zip(src, dst):
        want[d] += x[s]
        deg[d] += 1
    want -= deg[:, None] * x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_neighbor_aggregate_mean(rng):
    v, e, c = 25, 100, 4
    x = rng.normal(size=(v, c)).astype(np.float32)
    src, dst = random_graph(rng, v, e)
    got = np.asarray(neighbor_aggregate(
        jnp.asarray(x), jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)), v))
    want = np.zeros((v, c))
    cnt = np.zeros(v)
    for s, d in zip(src, dst):
        want[d] += x[s]
        cnt[d] += 1
    want /= np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

"""EdgeConvWithNorm (the SingleConvMeshNet filter: bias-free linears with
BatchNorm1d over edge messages) vs a literal torch oracle of the reference
MLP (edge_conv_filter.py:35-44 with_norm path)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from stinet_tpu.graph.build import _pad_edge_set
from stinet_tpu.models.singleconvmeshnet import EdgeConvWithNorm


def torch_edgeconv_with_norm(x, src, dst, w1, w2, trans_inv, train=True):
    xt = torch.from_numpy(x)
    xi, xj = xt[dst], xt[src]
    feat = (xj - xi) if trans_inv else torch.cat([xi, xj - xi], dim=1)
    m = feat @ torch.from_numpy(w1)
    bn1 = torch.nn.BatchNorm1d(m.shape[1], affine=True)
    bn2 = torch.nn.BatchNorm1d(w2.shape[1], affine=True)
    bn1.train(train), bn2.train(train)
    with torch.no_grad():
        y = bn2(torch.relu(bn1(m)) @ torch.from_numpy(w2))
        out = torch.zeros((x.shape[0], y.shape[1]))
        cnt = torch.zeros(x.shape[0])
        out.index_add_(0, torch.from_numpy(dst), y)
        cnt.index_add_(0, torch.from_numpy(dst), torch.ones(len(dst)))
        return (out / cnt.clamp(min=1)[:, None]).numpy()


def test_edgeconv_with_norm_matches_torch(rng):
    v, v_pad, e, c, co = 50, 64, 400, 6, 5
    src = rng.integers(0, v, size=e)
    dst = rng.integers(0, v, size=e)
    es = _pad_edge_set(np.stack([src, dst]), 512, v_pad - 1, v_pad,
                       cap_quantile=1.0)
    x = rng.normal(size=(v_pad, c)).astype(np.float32)
    x[v:] = 0

    module = EdgeConvWithNorm(c, co, trans_inv=False)
    variables = module.init(jax.random.key(0), jnp.asarray(x), es,
                            train=True)
    got, _ = module.apply(variables, jnp.asarray(x), es, train=True,
                          mutable=["batch_stats"])
    got = np.asarray(got)

    w1 = np.asarray(variables["params"]["lin1_kernel"], np.float32)
    w2 = np.asarray(variables["params"]["lin2_kernel"], np.float32)
    # valid edges in sorted-by-dst order (matching the masked BN statistics)
    order = np.argsort(dst, kind="stable")
    want = torch_edgeconv_with_norm(
        x, src[order].astype(np.int64), dst[order].astype(np.int64),
        w1, w2, trans_inv=False)
    np.testing.assert_allclose(got[:v], want[:v], rtol=2e-3, atol=2e-4)


def test_edgeconv_with_norm_transinv(rng):
    v, v_pad, e, c, co = 40, 64, 300, 9, 4
    src = rng.integers(0, v, size=e)
    dst = rng.integers(0, v, size=e)
    es = _pad_edge_set(np.stack([src, dst]), 384, v_pad - 1, v_pad,
                       cap_quantile=1.0)
    x = rng.normal(size=(v_pad, c)).astype(np.float32)
    x[v:] = 0
    module = EdgeConvWithNorm(c, co, trans_inv=True)
    variables = module.init(jax.random.key(0), jnp.asarray(x), es,
                            train=True)
    got, _ = module.apply(variables, jnp.asarray(x), es, train=True,
                          mutable=["batch_stats"])
    w1 = np.asarray(variables["params"]["lin1_kernel"], np.float32)
    w2 = np.asarray(variables["params"]["lin2_kernel"], np.float32)
    order = np.argsort(dst, kind="stable")
    want = torch_edgeconv_with_norm(
        x, src[order].astype(np.int64), dst[order].astype(np.int64),
        w1, w2, trans_inv=True)
    np.testing.assert_allclose(np.asarray(got)[:v], want[:v],
                               rtol=2e-3, atol=2e-4)
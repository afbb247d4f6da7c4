"""Masked per-graph norms vs dense torch references (FastInstanceNorm /
SingleBatchGraphNorm semantics, including the batched equal-size case)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from stinet_tpu.ops import masked_instance_norm, masked_graph_norm
from stinet_tpu.ops.norms import masked_batch_norm_stats


def test_instance_norm_single_graph(rng):
    n, c = 100, 7
    x = rng.normal(size=(n, c)).astype(np.float32)
    # Reference single-graph path: F.instance_norm on [1, C, N]
    want = F.instance_norm(
        torch.from_numpy(x).t().unsqueeze(0), eps=1e-5).squeeze(0).t().numpy()
    graph_id = np.zeros(n, dtype=np.int32)
    got = np.asarray(masked_instance_norm(
        jnp.asarray(x), jnp.asarray(graph_id), 1, jnp.ones(n)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_batched_equal_sizes(rng):
    """Equal-size contiguous batch: must match per-graph normalization."""
    g, n, c = 3, 40, 5
    x = rng.normal(size=(g * n, c)).astype(np.float32)
    graph_id = np.repeat(np.arange(g), n).astype(np.int32)
    got = np.asarray(masked_instance_norm(
        jnp.asarray(x), jnp.asarray(graph_id), g, jnp.ones(g * n)))
    for i in range(g):
        blk = x[i * n:(i + 1) * n]
        want = F.instance_norm(
            torch.from_numpy(blk).t().unsqueeze(0)).squeeze(0).t().numpy()
        np.testing.assert_allclose(got[i * n:(i + 1) * n], want,
                                   rtol=1e-4, atol=1e-5)


def test_instance_norm_ignores_pad_rows(rng):
    n, pad, c = 50, 30, 4
    x = rng.normal(size=(n, c)).astype(np.float32)
    xp = np.concatenate([x, 100.0 * np.ones((pad, c), np.float32)])
    gid = np.concatenate([np.zeros(n, np.int32), np.full(pad, 1, np.int32)])
    mask = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
    got = np.asarray(masked_instance_norm(
        jnp.asarray(xp), jnp.asarray(gid), 1, jnp.asarray(mask)))
    base = np.asarray(masked_instance_norm(
        jnp.asarray(x), jnp.zeros(n, jnp.int32), 1, jnp.ones(n)))
    np.testing.assert_allclose(got[:n], base, rtol=1e-5)
    assert np.all(got[n:] == 0.0)


def test_graph_norm_matches_reference_formula(rng):
    n, c = 64, 6
    x = rng.normal(size=(n, c)).astype(np.float32)
    weight = rng.normal(size=c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean_scale = rng.normal(size=c).astype(np.float32)

    # Dense reference of SingleBatchGraphNorm (singlebatchgroupnorm.py:46-71).
    mean = x.mean(0)
    out = x - mean * mean_scale
    var = (out ** 2).mean(0)
    want = weight * out / np.sqrt(var + 1e-5) + bias

    got = np.asarray(masked_graph_norm(
        jnp.asarray(x), jnp.zeros(n, jnp.int32), 1, jnp.ones(n),
        jnp.asarray(weight), jnp.asarray(bias), jnp.asarray(mean_scale)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_stats_masked(rng):
    n, pad, c = 33, 11, 3
    x = rng.normal(size=(n + pad, c)).astype(np.float32)
    mask = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
    mean, var = masked_batch_norm_stats(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mean), x[:n].mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), x[:n].var(0), rtol=1e-4, atol=1e-6)


def test_broadcast_rows_matches_take_and_zeroes_pads(rng):
    from stinet_tpu.ops.norms import _broadcast_rows
    g, c, v = 5, 7, 40
    table = rng.normal(size=(g, c)).astype(np.float32)
    # ragged sorted graph ids + pad rows carrying id == g
    gid = np.sort(rng.integers(0, g, size=v)).astype(np.int32)
    gid[-6:] = g
    got = np.asarray(_broadcast_rows(
        jnp.asarray(table), jnp.asarray(gid), g))
    valid = gid < g
    np.testing.assert_allclose(got[valid], table[gid[valid]], rtol=1e-6)
    assert np.all(got[~valid] == 0.0)


def test_multigraph_instance_norm_matches_pergraph_dense(rng):
    """G>1 one-hot path == running the G=1 path per graph segment."""
    sizes = [17, 25, 9]
    pad = 8
    c = 4
    xs = [rng.normal(size=(s, c)).astype(np.float32) for s in sizes]
    x = np.concatenate(xs + [np.zeros((pad, c), np.float32)])
    gid = np.concatenate(
        [np.full(s, i, np.int32) for i, s in enumerate(sizes)]
        + [np.full(pad, len(sizes), np.int32)])
    mask = (gid < len(sizes)).astype(np.float32)
    got = np.asarray(masked_instance_norm(
        jnp.asarray(x), jnp.asarray(gid), len(sizes), jnp.asarray(mask)))
    off = 0
    for s, xi in zip(sizes, xs):
        want = np.asarray(masked_instance_norm(
            jnp.asarray(xi), jnp.zeros(s, jnp.int32), 1, jnp.ones(s)))
        np.testing.assert_allclose(got[off:off + s], want,
                                   rtol=1e-4, atol=1e-5)
        off += s
    assert np.all(got[off:] == 0.0)

"""Unit tests: segment ops vs dense numpy references (torch_scatter parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stinet_tpu.ops import segment_sum, segment_mean, segment_max, segment_count


def dense_segment(data, ids, num_segments, reduce):
    out = np.zeros((num_segments,) + data.shape[1:], dtype=np.float64)
    for s in range(num_segments):
        rows = data[ids == s]
        if rows.size == 0:
            continue
        if reduce == "sum":
            out[s] = rows.sum(0)
        elif reduce == "mean":
            out[s] = rows.mean(0)
        elif reduce == "max":
            out[s] = rows.max(0)
    return out


@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_segment_matches_dense(rng, reduce):
    n, c, s = 257, 5, 19
    data = rng.normal(size=(n, c)).astype(np.float32)
    ids = np.sort(rng.integers(0, s, size=n)).astype(np.int32)
    fn = {"sum": segment_sum, "mean": segment_mean, "max": segment_max}[reduce]
    got = fn(jnp.asarray(data), jnp.asarray(ids), s, indices_are_sorted=True)
    want = dense_segment(data, ids, s, reduce)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_empty_segments_are_zero(rng):
    data = rng.normal(size=(10, 3)).astype(np.float32)
    ids = np.zeros(10, dtype=np.int32)  # everything in segment 0
    for fn in (segment_mean, segment_max):
        out = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), 4))
        assert np.all(out[1:] == 0.0)


def test_out_of_range_ids_dropped(rng):
    """Pad entries use segment id == num_segments; they must be dropped."""
    data = np.ones((6, 2), dtype=np.float32)
    ids = np.array([0, 0, 1, 3, 3, 3], dtype=np.int32)  # 3 == num_segments
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 3))
    np.testing.assert_allclose(out[:, 0], [2.0, 1.0, 0.0])


def test_segment_mean_grad(rng):
    n, c, s = 64, 4, 9
    data = rng.normal(size=(n, c)).astype(np.float32)
    ids = np.sort(rng.integers(0, s, size=n)).astype(np.int32)

    def loss(x):
        return jnp.sum(segment_mean(x, jnp.asarray(ids), s) ** 2)

    g = jax.grad(loss)(jnp.asarray(data))
    # Each row's grad = 2 * mean_of_its_segment / count_of_its_segment.
    means = dense_segment(data, ids, s, "mean")
    counts = np.bincount(ids, minlength=s)
    want = 2 * means[ids] / np.maximum(counts[ids], 1)[:, None]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-5)


def test_segment_max_grad_flows_to_argmax(rng):
    data = np.array([[1.0], [5.0], [3.0]], dtype=np.float32)
    ids = np.array([0, 0, 0], dtype=np.int32)

    def loss(x):
        return jnp.sum(segment_max(x, jnp.asarray(ids), 2))

    g = np.asarray(jax.grad(loss)(jnp.asarray(data)))
    np.testing.assert_allclose(g[:, 0], [0.0, 1.0, 0.0])


def test_segment_count_with_mask():
    ids = jnp.array([0, 0, 1, 2, 2], dtype=jnp.int32)
    mask = jnp.array([1.0, 1.0, 0.0, 1.0, 1.0])
    out = np.asarray(segment_count(ids, 3, valid_mask=mask))
    np.testing.assert_allclose(out, [2.0, 0.0, 2.0])


def test_segment_max_tie_grad_routes_to_single_element(rng):
    """torch_scatter.scatter_max routes the gradient to exactly ONE argmax
    per (segment, feature), never splitting ties (VERDICT r1 item 8)."""
    # segment 0: rows 0,1,2 with a 3-way tie in feature 0 and a 2-way tie
    # in feature 1; segment 1: rows 3,4 tied in both features
    data = np.array([[2.0, 7.0], [2.0, 7.0], [2.0, 1.0],
                     [4.0, 4.0], [4.0, 4.0]], dtype=np.float32)
    ids = np.array([0, 0, 0, 1, 1], dtype=np.int32)

    def loss(x):
        return jnp.sum(segment_max(x, jnp.asarray(ids), 3))

    g = np.asarray(jax.grad(loss)(jnp.asarray(data)))
    for s in range(2):
        rows = g[ids == s]
        vals = data[ids == s]
        for f in range(2):
            col = rows[:, f]
            # exactly one element got the full gradient
            assert np.count_nonzero(col) == 1, (s, f, col)
            assert col.sum() == 1.0
            # and it is an achiever of the max
            winner = np.argmax(col)
            assert vals[winner, f] == vals[:, f].max()

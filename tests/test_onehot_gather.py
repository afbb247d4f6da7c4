"""Windowed one-hot MXU gather (ops/pallas/onehot_gather.py): interpret-mode
parity vs the ELL reference semantics on banded graphs."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stinet_tpu.ops.pallas.onehot_gather import (  # noqa: E402
    pallas_windowed_edge_conv_sum)


def _banded_case(v, h, d, halo, seed=0):
    rng = np.random.default_rng(seed)
    base = np.arange(v)
    offs = rng.integers(-halo, halo + 1, size=(v, d))
    nbr = np.clip(base[:, None] + offs, 0, v - 1).astype(np.int32)
    deg = rng.integers(1, d + 1, size=v).astype(np.float32)
    p = rng.normal(size=(v, h)).astype(np.float32)
    q = rng.normal(size=(v, h)).astype(np.float32)
    return p, q, nbr, deg


def _oracle(p, q, nbr, deg):
    p16 = p.astype(jnp.bfloat16).astype(np.float32)
    q16 = q.astype(jnp.bfloat16).astype(np.float32)
    acc = np.zeros_like(p16)
    for d in range(nbr.shape[1]):
        m = np.maximum(p16 + q16[nbr[:, d]], 0.0)
        acc += np.where((d < deg.astype(np.int64))[:, None], m, 0.0)
    return acc


@pytest.mark.parametrize("v,h,d,halo,tile", [
    (1024, 128, 12, 96, 256),
    (512, 128, 5, 40, 128),
    (1024, 256, 12, 200, 256),  # window close to clamping at both ends
])
def test_windowed_onehot_matches_oracle(v, h, d, halo, tile):
    p, q, nbr, deg = _banded_case(v, h, d, halo)
    out = pallas_windowed_edge_conv_sum(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(nbr),
        jnp.asarray(deg), halo=halo, tile=tile, interpret=True)
    ref = _oracle(p, q, nbr, deg)
    got = np.asarray(out, np.float32)
    # one-hot selection is exact on bf16 rows; diffs come from the bf16
    # cast of inputs (already applied in the oracle) and f32 accumulation
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_window_covers_full_graph_when_halo_large():
    v, h, d = 512, 128, 8
    p, q, nbr, deg = _banded_case(v, h, d, halo=80)
    # halo so large the window is the whole graph -> arbitrary indices OK
    rng = np.random.default_rng(3)
    nbr = rng.integers(0, v, size=(v, d)).astype(np.int32)
    out = pallas_windowed_edge_conv_sum(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(nbr),
        jnp.asarray(deg), halo=v, tile=128, interpret=True)
    ref = _oracle(p, q, nbr, deg)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_windowed_vjp_matches_xla_ell():
    """fwd + dp + dq of the windowed custom VJP vs ops/ell.py's gather VJP
    on a banded graph (both in bf16 compute with f32 accumulation)."""
    from stinet_tpu.ops.ell import ell_edge_conv_sum
    from stinet_tpu.ops.pallas.onehot_gather import windowed_ell_edge_conv_sum

    v, h, d, halo = 512, 128, 6, 64
    rng = np.random.default_rng(1)
    base = np.arange(v)
    offs = rng.integers(-halo, halo + 1, size=(v, d))
    nbr = np.clip(base[:, None] + offs, 0, v - 1).astype(np.int32)
    deg_in = rng.integers(1, d + 1, size=v).astype(np.float32)
    # build a consistent reverse table from the valid (banded) edges
    edges = [(nbr[i, k], i) for i in range(v)
             for k in range(int(deg_in[i]))]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    deg_out = np.bincount(src, minlength=v)
    d_out = int(deg_out.max())
    rev = np.zeros((v, d_out), np.int32)
    slots = np.zeros(v, np.int64)
    for s_, r_ in zip(src, dst):
        rev[s_, slots[s_]] = r_
        slots[s_] += 1
    # rev index band: |rev[s,j] - s| <= halo by construction

    p = jnp.asarray(rng.normal(size=(v, h)), dtype=jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(v, h)), dtype=jnp.bfloat16)
    nbr_j = jnp.asarray(nbr)
    rev_j = jnp.asarray(rev)
    din = jnp.asarray(deg_in)
    dout = jnp.asarray(deg_out.astype(np.float32))

    def win_loss(p, q):
        out = windowed_ell_edge_conv_sum(halo, 128, True, p, q, nbr_j,
                                         rev_j, din, dout)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def xla_loss(p, q):
        out = ell_edge_conv_sum(p, q, nbr_j, rev_j, din, dout)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    lw, (dpw, dqw) = jax.value_and_grad(win_loss, argnums=(0, 1))(p, q)
    lx, (dpx, dqx) = jax.value_and_grad(xla_loss, argnums=(0, 1))(p, q)
    np.testing.assert_allclose(float(lw), float(lx), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(dpw, np.float32),
                               np.asarray(dpx, np.float32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(dqw, np.float32),
                               np.asarray(dqx, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_f32_planes_reconstruct_exactly():
    from stinet_tpu.ops.pallas.onehot_gather import _f32_planes

    rng = np.random.default_rng(0)
    # wide dynamic range: exponents spanning ~1e-30 .. 1e30
    x = (rng.normal(size=(256, 64))
         * (10.0 ** rng.integers(-30, 31, size=(256, 1)))).astype(np.float32)
    h = x.shape[1]
    # must run under jit: the split guards against XLA's excess-precision
    # elision of f32->bf16->f32 round-trips (the bug this test pins)
    planes = np.asarray(jax.jit(_f32_planes)(jnp.asarray(x)))
    rec = (planes[:, :h].astype(np.float32)
           + planes[:, h:2 * h].astype(np.float32)) \
        + planes[:, 2 * h:].astype(np.float32)
    np.testing.assert_array_equal(rec, x)


def test_windowed_f32_bit_exact_vs_xla_ell():
    """The bf16x3-plane f32 kernel must be BIT-IDENTICAL to ops/ell.py's
    f32 path — forward and (XLA-reused) backward."""
    from stinet_tpu.ops.ell import ell_edge_conv_sum
    from stinet_tpu.ops.pallas.onehot_gather import (
        windowed_ell_edge_conv_sum_f32)

    v, h, d, halo = 512, 128, 6, 64
    rng = np.random.default_rng(2)
    base = np.arange(v)
    offs = rng.integers(-halo, halo + 1, size=(v, d))
    nbr = jnp.asarray(np.clip(base[:, None] + offs, 0, v - 1)
                      .astype(np.int32))
    rev = jnp.asarray(np.clip(
        base[:, None] + rng.integers(-halo, halo + 1, size=(v, d)),
        0, v - 1).astype(np.int32))
    deg = jnp.asarray(rng.integers(0, d + 1, size=v).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    q = jnp.asarray((rng.normal(size=(v, h))
                     * (10.0 ** rng.integers(-3, 4, size=(v, 1))))
                    .astype(np.float32))

    def win(p, q):
        return windowed_ell_edge_conv_sum_f32(halo, 128, True, p, q, nbr,
                                              rev, deg, deg)

    def xla(p, q):
        return ell_edge_conv_sum(p, q, nbr, rev, deg, deg)

    np.testing.assert_array_equal(np.asarray(jax.jit(win)(p, q)),
                                  np.asarray(jax.jit(xla)(p, q)))
    gw = jax.grad(lambda p, q: jnp.sum(win(p, q) ** 2), argnums=(0, 1))(p, q)
    gx = jax.grad(lambda p, q: jnp.sum(xla(p, q) ** 2), argnums=(0, 1))(p, q)
    np.testing.assert_array_equal(np.asarray(gw[0]), np.asarray(gx[0]))
    np.testing.assert_array_equal(np.asarray(gw[1]), np.asarray(gx[1]))

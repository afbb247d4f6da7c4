"""Interpret-mode correctness of the DMA-pipelined ELL aggregation kernel
(ops/pallas/gather_pipeline.py) vs the XLA unrolled forward (ops/ell.py).
Hardware benchmarking happens in bench_pallas.py on a real chip."""
import jax.numpy as jnp
import numpy as np

from stinet_tpu.ops.ell import _forward as ell_forward_xla
from stinet_tpu.ops.pallas.gather_pipeline import pallas_ell_edge_conv_sum


def test_pallas_gather_matches_xla(rng):
    v, h, d = 512, 128, 7
    tile = 128
    p = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    deg = jnp.asarray(rng.integers(0, d + 1, size=v).astype(np.float32))
    nbr_np = rng.integers(0, v, size=(v, d)).astype(np.int32)
    # pad slots must hold a valid row id (builders point them at the trash
    # row); values beyond deg must not affect the result
    nbr = jnp.asarray(nbr_np)

    want = np.asarray(ell_forward_xla(p, q, nbr, deg))
    got = np.asarray(pallas_ell_edge_conv_sum(
        p, q, nbr, deg, tile=tile, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pallas_gather_zero_degree_rows(rng):
    v, h, d = 256, 128, 4
    p = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    deg = jnp.zeros(v, jnp.float32)
    nbr = jnp.asarray(rng.integers(0, v, size=(v, d)).astype(np.int32))
    out = np.asarray(pallas_ell_edge_conv_sum(
        p, q, nbr, deg, tile=128, interpret=True))
    np.testing.assert_allclose(out, 0.0)

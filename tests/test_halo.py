"""Graph-partition parallelism: all-gather and ring-halo edge conv on the
8-device CPU mesh must match the single-device ELL kernel exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stinet_tpu.graph.build import _pad_edge_set
from stinet_tpu.parallel.halo import (
    allgather_edge_conv, halo_edge_conv, build_halo_plan)
from stinet_tpu.parallel.mesh import make_mesh
from stinet_tpu.ops.ell import ell_edge_conv_mean


def make_graph(rng, v_pad=512, e=2000):
    # locality-ish edges: most neighbors nearby, some long-range
    src = rng.integers(0, v_pad - 1, size=e)
    near = (src + rng.integers(-20, 21, size=e)) % (v_pad - 1)
    far = rng.integers(0, v_pad - 1, size=e)
    dst = np.where(rng.random(e) < 0.9, near, far)
    return _pad_edge_set(np.stack([src, dst]), 2048, v_pad - 1, v_pad)


@pytest.fixture
def setup(rng):
    es = make_graph(rng)
    v_pad = es.degree.shape[0]
    h = 32
    p = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
    ref = np.asarray(ell_edge_conv_mean(
        p, q, es.nbr, es.rev_dst, es.degree, es.out_degree))
    return es, p, q, ref


def test_allgather_edge_conv_matches(setup):
    es, p, q, ref = setup
    n = jax.device_count()
    mesh = make_mesh(n, model_parallel=1)
    fn = allgather_edge_conv(mesh)
    out = np.asarray(fn(p, q, jnp.asarray(es.nbr), jnp.asarray(es.degree)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_halo_edge_conv_matches(setup, n_parts):
    es, p, q, ref = setup
    if jax.device_count() < n_parts:
        pytest.skip("not enough devices")
    v_pad = es.degree.shape[0]
    plan = build_halo_plan(np.asarray(es.nbr), v_pad, n_parts)
    mesh = make_mesh(n_parts, model_parallel=1)
    fn = halo_edge_conv(mesh, n_parts)
    out = np.asarray(fn(
        p, q, jnp.asarray(plan.nbr_halo), jnp.asarray(es.degree),
        jnp.asarray(plan.send_idx)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_halo_plan_invariants(rng):
    es = make_graph(rng)
    v_pad = es.degree.shape[0]
    n_parts = 4
    vp = v_pad // n_parts
    plan = build_halo_plan(np.asarray(es.nbr), v_pad, n_parts)
    nbr = np.asarray(es.nbr)
    # local entries keep local index; remote entries map into halo space
    owner = nbr // vp
    me = (np.arange(v_pad) // vp)[:, None]
    local = owner == me
    np.testing.assert_array_equal(plan.nbr_halo[local], (nbr % vp)[local])
    assert (plan.nbr_halo[~local] >= vp).all()
    # halo indices stay within the extended buffer
    assert plan.nbr_halo.max() < vp + (n_parts - 1) * plan.halo_width
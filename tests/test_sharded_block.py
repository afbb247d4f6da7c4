"""Graph-partitioned STINet block (halo conv + psum instance norm +
residual) vs the single-device GraphResnetBlock math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stinet_tpu.graph.build import _pad_edge_set
from stinet_tpu.ops.ell import ell_edge_conv_mean
from stinet_tpu.ops.norms import masked_instance_norm
from stinet_tpu.parallel.halo import build_halo_plan
from stinet_tpu.parallel.mesh import make_mesh
from stinet_tpu.parallel.sharded_block import (
    make_sharded_resnet_block, sharded_instance_norm)


def test_sharded_instance_norm(rng):
    n = jax.device_count()
    mesh = make_mesh(n, model_parallel=1)
    v_pad, c = 64 * n, 6
    valid = v_pad - 17
    x = jnp.asarray(rng.normal(size=(v_pad, c)).astype(np.float32))
    vmask = (jnp.arange(v_pad) < valid).astype(jnp.float32)
    got = np.asarray(sharded_instance_norm(mesh)(x, vmask))
    want = np.asarray(masked_instance_norm(
        x, jnp.zeros(v_pad, jnp.int32), 1, vmask))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_resnet_block_matches_single_device(rng):
    n_parts = jax.device_count()
    mesh = make_mesh(n_parts, model_parallel=1)
    v_pad, c_in, c_out = 128 * n_parts, 12, 8
    valid = v_pad - 50
    e = 6 * valid
    src = rng.integers(0, valid, size=e)
    near = (src + rng.integers(-16, 17, size=e)) % valid
    es = _pad_edge_set(np.stack([src, near]), 8192, v_pad - 1, v_pad,
                       cap_quantile=1.0)
    assert es.spill_src is None
    plan = build_halo_plan(np.asarray(es.nbr), v_pad, n_parts)

    hidden = 2 * c_out
    params = {
        "wi_minus_wd": jnp.asarray(
            rng.normal(size=(c_in, hidden)).astype(np.float32) * 0.2),
        "wd": jnp.asarray(
            rng.normal(size=(c_in, hidden)).astype(np.float32) * 0.2),
        "b1": jnp.asarray(rng.normal(size=hidden).astype(np.float32) * 0.1),
        "lin2_kernel": jnp.asarray(
            rng.normal(size=(hidden, c_out)).astype(np.float32) * 0.2),
        "lin2_bias": jnp.asarray(
            rng.normal(size=c_out).astype(np.float32) * 0.1),
        "shortcut_kernel": jnp.asarray(
            rng.normal(size=(c_in, c_out)).astype(np.float32) * 0.2),
        "shortcut_bias": jnp.zeros(c_out),
    }
    x = jnp.asarray(rng.normal(size=(v_pad, c_in)).astype(np.float32))
    vmask = (jnp.arange(v_pad) < valid).astype(jnp.float32)

    block = make_sharded_resnet_block(mesh, n_parts, plan, es.degree)
    got = np.asarray(block(x, params, vmask))

    # single-device reference of the same math
    p = x @ params["wi_minus_wd"] + params["b1"]
    q = x @ params["wd"]
    agg = ell_edge_conv_mean(p, q, es.nbr, es.rev_dst, es.degree,
                             es.out_degree)
    out = agg @ params["lin2_kernel"] + params["lin2_bias"]
    out = masked_instance_norm(out, jnp.zeros(v_pad, jnp.int32), 1, vmask)
    out = jax.nn.elu(out)
    want = np.asarray(
        x @ params["shortcut_kernel"] + params["shortcut_bias"] + out)

    np.testing.assert_allclose(got[:valid], want[:valid],
                               rtol=1e-4, atol=1e-5)
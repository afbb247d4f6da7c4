"""Pallas fused instance norm: interpret-mode correctness on the CPU suite
(compiled-mode correctness is exercised on TPU by the bench/model path)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl
from stinet_tpu.ops.pallas import instance_norm as pin
from stinet_tpu.ops.norms import masked_instance_norm


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pin.pl, "pallas_call", interp)


def test_pallas_instance_norm_matches(rng, interpret_pallas):
    v, c, valid = 1024, 32, 900
    x = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32) * 2 + 0.5)
    out = np.asarray(pin.pallas_instance_norm(x, jnp.int32(valid)))
    mask = (jnp.arange(v) < valid).astype(jnp.float32)
    want = np.asarray(masked_instance_norm(
        x, jnp.zeros(v, jnp.int32), 1, mask))
    np.testing.assert_allclose(out[:valid], want[:valid],
                               rtol=1e-4, atol=1e-5)
    assert np.abs(out[valid:]).max() == 0.0


def test_pallas_instance_norm_grad(rng, interpret_pallas):
    v, c, valid = 512, 16, 400
    x = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))
    mask = (jnp.arange(v) < valid).astype(jnp.float32)
    w = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32))

    g1 = jax.grad(lambda x: jnp.sum(
        pin.pallas_instance_norm(x, jnp.int32(valid)) * w))(x)
    g2 = jax.grad(lambda x: jnp.sum(masked_instance_norm(
        x, jnp.zeros(v, jnp.int32), 1, mask) * w))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-5)
"""FID machinery, InceptionV3 / VGG16 feature extractors (random weights:
shape + mechanics tests; numeric parity requires converted pretrained
weights, which need external files)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stinet_tpu.metrics.fid import (
    FIDScoreCumulative, calculate_frechet_distance,
    calculate_activation_statistics)


def test_frechet_identical_is_zero(rng):
    acts = rng.normal(size=(500, 16))
    mu, sigma = calculate_activation_statistics(acts)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_known_gaussians():
    """Diagonal Gaussians: FID = |mu1-mu2|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1, s2 = np.eye(d) * 4.0, np.eye(d) * 1.0
    want = np.sum((mu1 - mu2) ** 2) + d * (2.0 - 1.0) ** 2
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fid_cumulative_sessions(rng):
    fid = FIDScoreCumulative()
    a = rng.normal(size=(300, 8))
    b = rng.normal(loc=1.0, size=(300, 8))
    for chunk in np.split(a, 3):
        fid.add_activations("real", chunk)
    for chunk in np.split(b, 3):
        fid.add_activations("fake", chunk)
    assert fid.num_samples("real") == 300
    d_ab = fid.fid_between("real", "fake")
    assert d_ab > 1.0
    # same distribution -> small
    fid.add_activations("real2", rng.normal(size=(300, 8)))
    assert fid.fid_between("real", "real2") < d_ab
    # freezing drops buffers but keeps stats
    fid.freeze_statistics("real")
    assert fid.num_samples("real") == 0
    assert fid.fid_between("real", "fake") == pytest.approx(d_ab)


@pytest.mark.slow
def test_inception_shapes(rng):
    from stinet_tpu.models.inception import InceptionV3, FID_POOL_DIM
    model = InceptionV3(resize_input=True, normalize_input=True)
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, FID_POOL_DIM)
    assert np.isfinite(np.asarray(feats)).all()


def test_vgg_loss_mechanics(rng):
    from stinet_tpu.models.vgg import VGG16Features, VGGLoss, gram_matrix
    module = VGG16Features()
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32))
    variables = module.init(jax.random.key(0), x)
    loss = VGGLoss(variables, resize_to=64)
    c, s = loss(x, x)
    assert float(c) == pytest.approx(0.0, abs=1e-6)
    assert float(s) == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(rng.uniform(-1, 1, size=x.shape).astype(np.float32))
    c2, s2 = loss(x, y)
    assert float(c2) > 0 and float(s2) >= 0

    g = gram_matrix(jnp.ones((1, 4, 4, 2)))
    np.testing.assert_allclose(np.asarray(g)[0], np.full((2, 2), 0.5),
                               rtol=1e-6)

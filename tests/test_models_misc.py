"""Shape/semantics tests: Resnet2D, GAN zoo, losses, classification metrics,
SingleConvMeshNet vs a dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stinet_tpu.models.losses import cse_loss, total_variation_loss, dice_loss
from stinet_tpu.metrics.metric import accuracy, top_k_acc


def test_resnet2d_shapes(rng):
    from stinet_tpu.models.resnet2d import Resnet2D
    for pooling in ("stride", "max", "mean"):
        model = Resnet2D(input_nc=4, output_nc=3, ngf=8, n_blocks=2,
                         n_levels=2, dilation_order=1, pooling_type=pooling,
                         io_receptive_field_type="normal")
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 4)).astype(np.float32))
        params = model.init(jax.random.key(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out.shape == (1, 32, 32, 3)
        assert np.abs(np.asarray(out)).max() <= 1.0


def test_gan_networks_shapes(rng):
    from stinet_tpu.models.gan_networks import (
        ResnetGenerator, UnetGenerator, NLayerDiscriminator,
        PixelDiscriminator, gan_loss)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    # default norm="batch" carries a batch_stats collection; thread the
    # full variable dict (instance-norm variants are param-only)
    g = ResnetGenerator(3, 3, ngf=8, n_blocks=2)
    v = g.init(jax.random.key(0), x)
    assert g.apply(v, x).shape == (1, 64, 64, 3)

    u = UnetGenerator(3, 3, num_downs=5, ngf=8, norm="instance")
    v = u.init(jax.random.key(0), x)
    assert u.apply(v, x).shape == (1, 64, 64, 3)

    d = NLayerDiscriminator(3, ndf=8, n_layers=3, norm="instance")
    v = d.init(jax.random.key(0), x)
    out = d.apply(v, x)
    assert out.shape[0] == 1 and out.shape[-1] == 1  # patch map

    pd = PixelDiscriminator(3, ndf=8, norm="instance")
    v = pd.init(jax.random.key(0), x)
    assert pd.apply(v, x).shape == (1, 64, 64, 1)

    pred = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    for mode in ("lsgan", "vanilla", "wgangp"):
        assert np.isfinite(float(gan_loss(pred, True, mode)))
        assert np.isfinite(float(gan_loss(pred, False, mode)))


def test_gan_loss_matches_torch(rng):
    from stinet_tpu.models.gan_networks import gan_loss
    pred = rng.normal(size=(4, 5)).astype(np.float32)
    t = torch.from_numpy(pred)
    # lsgan == MSE vs target (reference gan_networks.py:219-285)
    want = F.mse_loss(t, torch.ones_like(t)).item()
    got = float(gan_loss(jnp.asarray(pred), True, "lsgan"))
    assert got == pytest.approx(want, rel=1e-5)
    # vanilla == BCEWithLogits
    want = F.binary_cross_entropy_with_logits(
        t, torch.zeros_like(t)).item()
    got = float(gan_loss(jnp.asarray(pred), False, "vanilla"))
    assert got == pytest.approx(want, rel=1e-5)


def test_cse_loss_matches_torch(rng):
    logits = rng.normal(size=(20, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=20)
    weights = rng.uniform(0.5, 2.0, size=5).astype(np.float32)
    want = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        weight=torch.from_numpy(weights), ignore_index=0).item()
    got = float(cse_loss(jnp.asarray(logits), jnp.asarray(targets),
                         weights=jnp.asarray(weights), ignore_index=0))
    assert got == pytest.approx(want, rel=1e-5)


def test_tv_loss_matches_torch(rng):
    img = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    tv_h = (t[:, :, 1:] - t[:, :, :-1]).pow(2).sum()
    tv_w = (t[:, :, :, 1:] - t[:, :, :, :-1]).pow(2).sum()
    want = (0.1 * (tv_h + tv_w) / t.numel()).item()
    got = float(total_variation_loss(jnp.asarray(img), 0.1))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_loss_range(rng):
    logits = rng.normal(size=(30, 4)).astype(np.float32)
    targets = rng.integers(0, 4, size=30)
    val = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert 0.0 <= val <= 1.0
    # perfect prediction -> near 0 loss
    one_hot_logits = 100.0 * jax.nn.one_hot(jnp.asarray(targets), 4)
    assert float(dice_loss(one_hot_logits, jnp.asarray(targets))) < 0.05


def test_accuracy_metrics(rng):
    logits = jnp.asarray([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    targets = jnp.asarray([0, 1, 0])
    assert float(accuracy(logits, targets)) == pytest.approx(2 / 3)
    assert float(top_k_acc(logits, targets, k=3)) == 1.0


def test_singleconvmeshnet_runs(rng):
    from stinet_tpu.graph import build_hierarchical_graph, grid_hierarchy
    from stinet_tpu.graph.build import RawHierarchy
    from stinet_tpu.models.singleconvmeshnet import SingleConvMeshNet
    nv, edges, traces = grid_hierarchy(16, 3)
    s = RawHierarchy(
        x=rng.normal(size=(nv[0], 9)).astype(np.float32),
        color=np.zeros((nv[0], 3), np.float32),
        mask=np.zeros((nv[0], 1), np.float32),
        num_vertices=list(nv), level_edges=list(edges), traces=list(traces),
        labels=rng.integers(0, 21, size=nv[0]).astype(np.int32))
    g = build_hierarchical_graph([s])
    model = SingleConvMeshNet(feature_number=9, num_propagation_steps=2,
                              filter_sizes=[8, 16, 32], num_classes=21)
    variables = model.init(jax.random.key(0), g)
    logits, updates = model.apply(variables, g, train=True,
                                  mutable=["batch_stats"])
    assert logits.shape == (g.x.shape[0], 21)
    assert np.isfinite(np.asarray(logits)).all()
    # eval path with running stats
    logits2 = model.apply({"params": variables["params"],
                           "batch_stats": updates["batch_stats"]},
                          g, train=False)
    assert np.isfinite(np.asarray(logits2)).all()
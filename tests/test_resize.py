"""Oracle tests for stinet_tpu.ops.resize — resize_right parity.

The reference's VGG loss resizes with Shocher's resize_right at its default
cubic kernel (/root/reference/models/losses/vgg16.py:30-33,
/root/reference/utils/resize_right.py:32). The strongest check imports the
actual reference module (pure torch) and compares end to end; it skips when
the reference tree is absent. Hermetic structural checks cover the rest.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from stinet_tpu.ops.resize import resize_image, resize_matrix

_REF_ROOT = "/root/reference"


def _ref_resize(x_nchw, out_hw):
    # load the two reference modules directly: the reference's
    # utils/__init__.py imports open3d (unavailable here), so going through
    # the package would fail
    import importlib.util
    import types
    saved = {k: sys.modules.get(k)
             for k in ("utils", "utils.interp_methods", "utils.resize_right")}
    try:
        pkg = types.ModuleType("utils")
        pkg.__path__ = [_REF_ROOT + "/utils"]
        sys.modules["utils"] = pkg
        for name in ("interp_methods", "resize_right"):
            spec = importlib.util.spec_from_file_location(
                f"utils.{name}", f"{_REF_ROOT}/utils/{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"utils.{name}"] = mod
            spec.loader.exec_module(mod)
        resize_right = sys.modules["utils.resize_right"]
        import torch
        t = torch.from_numpy(x_nchw)
        out = resize_right.resize(t, out_shape=list(out_hw))
        return out.numpy()
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.skipif(not os.path.isdir(_REF_ROOT + "/utils"),
                    reason="reference tree not available")
@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 48), (224, 224)),   # the VGG-loss upscale case
    ((224, 224), (64, 96)),   # antialiased downscale
    ((33, 224), (224, 17)),   # mixed, odd sizes
])
def test_resize_matches_reference_resize_right(in_hw, out_hw):
    rng = np.random.default_rng(0)
    # f32 on both sides: resize_right computes in the input dtype
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ref = _ref_resize(x, out_hw)
    got = resize_image(jnp.asarray(x.transpose(0, 2, 3, 1), jnp.float32),
                       out_hw)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert np.max(np.abs(got - ref)) < 1e-5


def test_resize_preserves_constant_interior():
    x = jnp.full((1, 40, 56, 3), 0.7, jnp.float32)
    out = np.asarray(resize_image(x, (224, 224)))
    # resize_right zero-pads (pad_mode='constant' default), so edges darken;
    # the interior must be exactly constant
    np.testing.assert_allclose(out[:, 16:-16, 16:-16], 0.7, rtol=0,
                               atol=1e-6)
    # interior rows of the weight matrix sum to 1
    m = resize_matrix(40, 224)
    np.testing.assert_allclose(m.sum(axis=1)[16:-16], 1.0, atol=1e-6)


def test_resize_linear_ramp_interior_exact():
    # a linear ramp is reproduced exactly by the cubic kernel away from edges
    h, w = 32, 32
    ramp = np.tile(np.linspace(0.0, 1.0, w, dtype=np.float32), (h, 1))
    x = jnp.asarray(ramp[None, :, :, None])
    out = np.asarray(resize_image(x, (64, 64)))[0, :, :, 0]
    expect = (np.arange(64) + 0.5) / 2.0 - 0.5  # projected source coords
    expect = expect / (w - 1)
    interior = slice(6, -6)
    np.testing.assert_allclose(out[32, interior], expect[interior],
                               atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(_REF_ROOT + "/utils"),
                    reason="reference tree not available")
def test_vgg_prep_chain_matches_reference():
    """The reference VGG16.forward preamble (vgg16.py:30-33): saturating
    clamp(X+0.5, 0, 1) on its [-1,1] trainer inputs, BGR swap, ImageNet
    normalize, resize_right to 224 — vs VGGLoss._prep."""
    from stinet_tpu.models.vgg import VGGLoss
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 3, 31, 47)).astype(np.float32)

    ref = np.clip(x + 0.5, 0.0, 1.0)[:, [2, 1, 0]]
    mean = np.array([0.485, 0.456, 0.406], np.float32)[None, :, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[None, :, None, None]
    ref = _ref_resize((ref - mean) / std, (224, 224))

    loss = VGGLoss(variables=None)
    got = np.asarray(loss._prep(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_hwc_squeeze_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((20, 24, 3)), jnp.float32)
    out = resize_image(x, (10, 12))
    assert out.shape == (10, 12, 3)

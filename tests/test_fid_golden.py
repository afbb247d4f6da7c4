"""Golden-value FID regression coverage (VERDICT r2 item 7): exact numeric
checks of `calculate_frechet_distance` including the eps-stabilized retry
branch, LinAlgWarning containment on singular products, and an end-to-end
pinned value through the real (seeded random-init) InceptionV3 extractor.
Reference semantics: fid_score_cumulative.py:134-188."""
import warnings

import numpy as np
import pytest
from scipy import linalg

from stinet_tpu.metrics.fid import (FIDScoreCumulative,
                                    calculate_activation_statistics,
                                    calculate_frechet_distance)


def test_frechet_distance_analytic_diagonal():
    """Diagonal covariances have a closed form:
    ||mu1-mu2||^2 + tr(s1) + tr(s2) - 2 tr(sqrt(s1 s2))
    = (1+4) + (1+4) + (9+16) - 2*(3+8) = 13 exactly."""
    mu1, mu2 = np.zeros(2), np.array([1.0, 2.0])
    s1, s2 = np.diag([1.0, 4.0]), np.diag([9.0, 16.0])
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, 13.0, rtol=0, atol=1e-10)


def test_frechet_distance_dense_golden():
    """Pinned value for seeded dense covariances (regression lock on the
    sqrtm + trace arithmetic)."""
    rng = np.random.default_rng(123)
    a1 = rng.normal(size=(64, 8))
    a2 = rng.normal(size=(64, 8)) * 1.3 + 0.2
    m1, c1 = calculate_activation_statistics(a1)
    m2, c2 = calculate_activation_statistics(a2)
    got = calculate_frechet_distance(m1, c1, m2, c2)
    np.testing.assert_allclose(got, 2.095056197051399, rtol=1e-8)


def test_frechet_distance_symmetric_and_zero_on_self():
    rng = np.random.default_rng(7)
    a1 = rng.normal(size=(32, 6))
    a2 = rng.normal(size=(32, 6)) + 1.0
    m1, c1 = calculate_activation_statistics(a1)
    m2, c2 = calculate_activation_statistics(a2)
    d12 = calculate_frechet_distance(m1, c1, m2, c2)
    d21 = calculate_frechet_distance(m2, c2, m1, c1)
    np.testing.assert_allclose(d12, d21, rtol=1e-6)
    self_d = calculate_frechet_distance(m1, c1, m1, c1)
    assert abs(self_d) < 1e-8, self_d


def test_eps_retry_branch_on_nonfinite_sqrtm(monkeypatch):
    """When the primary sqrtm comes back non-finite, the eps-on-the-diagonal
    retry must produce a finite answer close to the true distance
    (fid_score_cumulative.py:134-188 semantics)."""
    calls = {"n": 0}
    real_sqrtm = linalg.sqrtm

    def flaky_sqrtm(a, *args, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return np.full_like(np.asarray(a, dtype=float), np.nan)
        return real_sqrtm(a, *args, **kw)

    monkeypatch.setattr("stinet_tpu.metrics.fid.linalg.sqrtm", flaky_sqrtm)
    mu1, mu2 = np.zeros(2), np.array([1.0, 2.0])
    s1, s2 = np.diag([1.0, 4.0]), np.diag([9.0, 16.0])
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert calls["n"] == 2  # retry actually fired
    assert np.isfinite(got)
    np.testing.assert_allclose(got, 13.0, rtol=1e-4)


def test_singular_product_no_linalg_warning():
    """Rank-deficient covariances (fewer samples than dims — the 2D trainer
    FID scenario) must neither raise nor leak scipy's LinAlgWarning; the
    result stays finite."""
    rng = np.random.default_rng(11)
    a1 = rng.normal(size=(4, 16))   # rank <= 3 covariance
    a2 = rng.normal(size=(4, 16))
    m1, c1 = calculate_activation_statistics(a1)
    m2, c2 = calculate_activation_statistics(a2)
    with warnings.catch_warnings():
        warnings.simplefilter("error", linalg.LinAlgWarning)
        got = calculate_frechet_distance(m1, c1, m2, c2)
    assert np.isfinite(got), got


@pytest.mark.slow
def test_fid_end_to_end_inception_golden():
    """Pinned FID through the REAL extractor chain: seeded random-init
    InceptionV3 (the trainer's no-weights path, inpainting2d.py::_setup_fid)
    on fixed batches. Random-init deep features are nearly constant (std
    ~5e-6), so the value is mean-difference dominated — still locks the
    extractor -> statistics -> distance pipeline end to end. rtol absorbs
    minor cross-version init drift; a conversion/resize regression moves
    this by orders of magnitude."""
    import jax
    import jax.numpy as jnp
    from stinet_tpu.models.inception import InceptionV3

    model = InceptionV3()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    feat = jax.jit(lambda x: model.apply(variables, x / 2.0 + 0.5))
    rng = np.random.default_rng(5)
    b1 = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    b2 = jnp.asarray(np.clip(rng.normal(0.5, 0.3, (8, 32, 32, 3)),
                             -1, 1).astype(np.float32))

    f = FIDScoreCumulative(
        feature_fn=lambda x: np.asarray(feat(x), np.float64))
    f.add_images("a", b1)
    f.add_images("b", b2)
    f.add_images("a_again", b1)
    assert f.num_samples("a") == 8

    with warnings.catch_warnings():
        warnings.simplefilter("error", linalg.LinAlgWarning)
        d_ab = f.fid_between("a", "b")
        d_aa = f.fid_between("a", "a_again")
    np.testing.assert_allclose(d_ab, 7.470410898571197e-06, rtol=0.05)
    assert abs(d_aa) < 1e-10, d_aa


# ---------------------------------------------------------------------------
# fid_cli dataset-format parity (reference fid_score.py:71-113, 327-377)
# ---------------------------------------------------------------------------

def _write_gz_uv(path, arr):
    import gzip
    with gzip.open(path, "wb") as f:
        f.write(np.ascontiguousarray(arr, dtype=np.float32).tobytes())


def test_load_uv_file_reshape_and_flip(tmp_path):
    """gz raw-float32 -> (H, W, 2) -> vertical flip (UVPathDataset:81-93)."""
    from stinet_tpu.metrics.fid_cli import load_uv_file
    h, w = 4, 3
    raw = np.arange(h * w * 2, dtype=np.float32).reshape(h, w, 2)
    _write_gz_uv(tmp_path / "a.gz", raw)
    got = load_uv_file(str(tmp_path / "a.gz"), (h, w))
    np.testing.assert_array_equal(got, raw[::-1])

    with pytest.raises(ValueError, match="expected"):
        load_uv_file(str(tmp_path / "a.gz"), (h + 1, w))


def test_load_uv_dataset_stack_and_scale(tmp_path):
    from stinet_tpu.metrics.fid_cli import load_uv_dataset
    h, w = 8, 8
    rng = np.random.default_rng(0)
    frames = [rng.normal(size=(h, w, 2)).astype(np.float32)
              for _ in range(3)]
    for i, fr in enumerate(frames):
        _write_gz_uv(tmp_path / f"{i}.gz", fr)
    ds = load_uv_dataset(str(tmp_path), (h, w))
    assert ds.shape == (3, h, w, 2)
    np.testing.assert_array_equal(ds[1], frames[1][::-1])

    # nearest-neighbor scale: factor-2 downscale picks pixel centers
    ds2 = load_uv_dataset(str(tmp_path), (h, w), scale_size=4)
    assert ds2.shape == (3, 4, 4, 2)
    flipped = frames[0][::-1]
    np.testing.assert_array_equal(ds2[0], flipped[1::2, 1::2])

    empty = load_uv_dataset(str(tmp_path / "nope"), (h, w))
    assert empty.shape == (0, h, w, 2)


def test_stats_of_path_npz_short_circuit(tmp_path):
    """A .npz path returns its stored mu/sigma without touching any
    extractor (compute_statistics_of_path:327-333)."""
    from stinet_tpu.metrics.fid_cli import stats_of_path
    mu = np.arange(4.0)
    sigma = np.eye(4) * 2.0
    np.savez(tmp_path / "stats.npz", mu=mu, sigma=sigma)
    fid = FIDScoreCumulative(feature_fn=None)  # would crash if used
    m, s = stats_of_path(str(tmp_path / "stats.npz"), fid, "k", 8)
    np.testing.assert_array_equal(m, mu)
    np.testing.assert_array_equal(s, sigma)


def test_fid_given_path_and_model_end_to_end(tmp_path):
    """gz UV folder -> model_fn -> features vs ground-truth image folder
    (calculate_fid_given_path_and_model:364-377), with a toy renderer and
    a cheap feature extractor; identical distributions give FID ~ 0."""
    from PIL import Image
    from stinet_tpu.metrics.fid_cli import fid_given_path_and_model

    h, w = 8, 8
    rng = np.random.default_rng(3)
    gt_dir = tmp_path / "gt"
    uv_dir = tmp_path / "uv"
    gt_dir.mkdir()
    uv_dir.mkdir()
    for i in range(6):
        uv = rng.uniform(0, 1, size=(h, w, 2)).astype(np.float32)
        _write_gz_uv(uv_dir / f"{i}.gz", uv)
        # the toy renderer below maps uv -> rgb; ground truth = rendered uv
        rgb = np.concatenate([uv[::-1], uv[::-1, :, :1]], axis=-1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            gt_dir / f"{i}.png")

    def model_fn(uv_batch):  # [B, H, W, 2] -> [B, H, W, 3]
        return np.concatenate([uv_batch, uv_batch[..., :1]], axis=-1)

    def feature_fn(imgs):   # cheap 6-dim features: channel means + stds
        x = np.asarray(imgs, np.float64).reshape(len(imgs), -1, 3)
        return np.concatenate([x.mean(1), x.std(1)], axis=1)

    fid = FIDScoreCumulative(feature_fn=feature_fn)
    val = fid_given_path_and_model(str(gt_dir), str(uv_dir), model_fn,
                                   (h, w), fid, batch_size=4)
    # PNG quantization to uint8 is the only difference: near zero
    assert 0 <= val < 1e-3, val

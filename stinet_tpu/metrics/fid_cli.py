"""Standalone FID CLI — parity with /root/reference/utils/metrics/
fid_score.py: folder-vs-folder FID over images, precomputed `.npz`
statistics files (compute_statistics_of_path:327-333), and the gzipped UV
dataset format (UVPathDataset:71-113) consumed through an inference model
(calculate_fid_given_path_and_model:364-377).

  python -m stinet_tpu.metrics.fid_cli path/to/real path/to/fake \
      [--inception-weights pt_inception.pth] [--batch-size 32]

Either path may be a `.npz` file with `mu`/`sigma` arrays instead of an
image folder; `--save-stats out.npz` writes path1's statistics for reuse.
"""
import argparse
import glob
import gzip
import os

import numpy as np


def load_images(folder, size=None):
    from PIL import Image
    files = sorted(sum((glob.glob(os.path.join(folder, e))
                        for e in ("*.png", "*.jpg", "*.jpeg")), []))
    imgs = []
    for f in files:
        img = Image.open(f).convert("RGB")
        if size:
            img = img.resize((size, size))
        imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
    return np.stack(imgs) if imgs else np.zeros((0, 1, 1, 3), np.float32)


def _nearest_resize(img, out_hw):
    """Nearest-neighbor resize with pixel-center alignment (the reference
    scales UV maps with skimage order=0, UVPathDataset._scale:95-113 —
    'can't interpolate across discontinuities in uv coordinates')."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    # floor(x + 0.5): scipy/skimage order-0 tie behavior (round half up),
    # not numpy's round-half-even
    rows = np.clip(np.floor((np.arange(oh) + 0.5) * h / oh), 0,
                   h - 1).astype(np.int64)
    cols = np.clip(np.floor((np.arange(ow) + 0.5) * w / ow), 0,
                   w - 1).astype(np.int64)
    return img[rows[:, None], cols[None, :]]


def load_uv_file(path, size):
    """One gzipped raw-float32 UV map: reshape to (H, W, 2), flip
    vertically (UVPathDataset.__getitem__:81-93)."""
    h, w = size
    with gzip.open(path, "rb") as f:
        uv = np.frombuffer(f.read(), dtype=np.float32)
    if uv.size != h * w * 2:
        raise ValueError(
            f"{path}: {uv.size} floats, expected {h}x{w}x2 = {h * w * 2}")
    return np.flip(uv.reshape(h, w, 2), axis=0).copy()


def load_uv_dataset(folder, size, scale_size=None):
    """[N, H, W, 2] float32 stack of every *.gz UV map under `folder`
    (reference compute_statistics_of_model:341-348 globs *.gz)."""
    files = sorted(glob.glob(os.path.join(folder, "*.gz")))
    out = []
    for f in files:
        uv = load_uv_file(f, size)
        if scale_size is not None:
            ss = ((scale_size, scale_size) if isinstance(scale_size, int)
                  else tuple(scale_size))
            uv = _nearest_resize(uv, ss)
        out.append(uv)
    return (np.stack(out) if out
            else np.zeros((0,) + tuple(size) + (2,), np.float32))


def stats_of_path(path, fid, key, batch_size, resize=None):
    """mu/sigma for `path`: a .npz statistics file short-circuits
    (reference compute_statistics_of_path:327-333); otherwise stream the
    folder's images through the extractor."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    imgs = load_images(path, resize)
    assert len(imgs) >= 2, f"need >=2 images in {path}"
    for i in range(0, len(imgs), batch_size):
        fid.add_images(key, imgs[i:i + batch_size])
    return fid.get_statistics(key)


def fid_given_path_and_model(truth_path, inf_path, model_fn, inf_size, fid,
                             batch_size=32, scale_size=None, resize=None):
    """Reference calculate_fid_given_path_and_model:364-377: ground-truth
    images (or .npz stats) vs a folder of gz UV maps pushed through
    `model_fn` (UV [B, H, W, 2] -> images [B, h, w, 3] in [0, 1])."""
    from stinet_tpu.metrics.fid import calculate_frechet_distance
    m1, s1 = stats_of_path(truth_path, fid, "truth", batch_size, resize)
    uvs = load_uv_dataset(inf_path, inf_size, scale_size)
    assert len(uvs) >= 2, f"need >=2 .gz UV maps in {inf_path}"
    for i in range(0, len(uvs), batch_size):
        fid.add_images("inf", np.asarray(model_fn(uvs[i:i + batch_size])))
    m2, s2 = fid.get_statistics("inf")
    return float(calculate_frechet_distance(m1, s1, m2, s2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path1")
    p.add_argument("path2")
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--resize", type=int, default=None)
    p.add_argument("--save-stats", default=None, metavar="OUT.npz",
                   help="also write path1's mu/sigma for later .npz reuse")
    p.add_argument("--device", default="cpu",
                   help="jax platform (reference fid_score.py --device; "
                        "default cpu — feature extraction is tiny and a "
                        "wedged TPU tunnel would hang the CLI)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", args.device)
    from stinet_tpu.metrics.fid import FIDScoreCumulative
    from stinet_tpu.models.inception import (
        InceptionV3, convert_torch_state_dict)

    model = InceptionV3()
    if args.inception_weights:
        import torch
        variables = convert_torch_state_dict(
            torch.load(args.inception_weights, map_location="cpu"))
    else:
        print("WARNING: no --inception-weights; using random features "
              "(relative comparison only)")
        variables = model.init(jax.random.key(0),
                               np.zeros((1, 64, 64, 3), np.float32))
    feature_fn = jax.jit(lambda imgs: model.apply(variables, imgs))
    fid = FIDScoreCumulative(feature_fn=feature_fn)

    from stinet_tpu.metrics.fid import calculate_frechet_distance
    m1, s1 = stats_of_path(args.path1, fid, "a", args.batch_size,
                           args.resize)
    if args.save_stats:
        np.savez(args.save_stats, mu=m1, sigma=s1)
    m2, s2 = stats_of_path(args.path2, fid, "b", args.batch_size,
                           args.resize)
    # full-precision print (reference fid_score.py:404): random-feature
    # values are tiny and a fixed-decimal format would show 0.0000
    print("FID:", float(calculate_frechet_distance(m1, s1, m2, s2)))


if __name__ == "__main__":
    main()

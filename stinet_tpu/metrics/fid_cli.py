"""Standalone FID CLI — parity with /root/reference/utils/metrics/
fid_score.py (folder-vs-folder FID):

  python -m stinet_tpu.metrics.fid_cli path/to/real path/to/fake \
      [--inception-weights pt_inception.pth] [--batch-size 32]
"""
import argparse
import glob
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path1")
    p.add_argument("path2")
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--resize", type=int, default=None)
    args = p.parse_args()

    import jax
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

    for key, folder in (("a", args.path1), ("b", args.path2)):
        imgs = load_images(folder, args.resize)
        assert len(imgs) >= 2, f"need >=2 images in {folder}"
        for i in range(0, len(imgs), args.batch_size):
            fid.add_images(key, imgs[i:i + args.batch_size])
    print(f"FID: {fid.fid_between('a', 'b'):.4f}")


if __name__ == "__main__":
    main()

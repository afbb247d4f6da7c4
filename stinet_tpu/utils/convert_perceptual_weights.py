"""Offline converter: torch perceptual-network weight files -> framework
weight files consumed by the trainers.

The reference downloads these at runtime (torchvision VGG16 at
/root/reference/models/losses/vgg16.py:15-22, FID InceptionV3 at
/root/reference/models/inception.py:13, the lpips package's AlexNet +
linear heads); this environment has no network, so conversion is a one-time
offline step wherever the torch files exist:

    python -m stinet_tpu.utils.convert_perceptual_weights vgg \
        --torch vgg16-397923af.pth --out vgg16_flax.msgpack
    python -m stinet_tpu.utils.convert_perceptual_weights inception \
        --torch pt_inception-2015-12-05.pth --out inception_flax.msgpack
    python -m stinet_tpu.utils.convert_perceptual_weights lpips \
        --torch alexnet.pth --lpips-torch lpips_alex.pth --out lpips.msgpack

Then point the trainer config at the converted file
(trainer.vgg_weights / inception_weights / lpips_weights — the trainers
accept either the raw torch file or these converted msgpacks)."""
import argparse


def _save(tree, path):
    from flax import serialization
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_msgpack(path):
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main():
    import numpy as np
    import torch

    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="net", required=True)
    for name in ("vgg", "inception", "lpips"):
        s = sub.add_parser(name)
        s.add_argument("--torch", required=True,
                       help="torch state-dict file")
        s.add_argument("--out", required=True)
        if name == "lpips":
            s.add_argument("--lpips-torch", default=None,
                           help="lpips package state dict (linear heads)")
    args = p.parse_args()

    sd = torch.load(args.torch, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    if args.net == "vgg":
        from stinet_tpu.models.vgg import convert_torch_vgg16
        tree = convert_torch_vgg16(sd)
    elif args.net == "inception":
        from stinet_tpu.models.inception import convert_torch_state_dict
        tree = convert_torch_state_dict(sd)
    else:
        from stinet_tpu.metrics.lpips import convert_torch_lpips
        lsd = None
        if args.lpips_torch:
            lsd = torch.load(args.lpips_torch, map_location="cpu",
                             weights_only=False)
        variables, lins = convert_torch_lpips(sd, lsd)
        tree = {"variables": variables,
                "lins": [np.asarray(w) for w in (lins or [])]}
    _save(tree, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

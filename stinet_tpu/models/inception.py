"""InceptionV3 feature extractor for FID — flax/NHWC re-implementation of
the pytorch-fid network used by the reference (/root/reference/models/
inception.py:16-328, a port of mseitzer/pytorch-fid). The FID variant
differs from torchvision in blocks A/C/E (average pooling excludes padding,
E-2 replaces max- with avg-pool in the pool branch); both quirks are
reproduced here.

Pretrained weights cannot be downloaded in this environment; use
`convert_torch_state_dict` to convert the pytorch-fid checkpoint
(pt_inception-2015-12-05) once and load it with flax serialization. Without
weights the module still runs (random init) so FID plumbing is testable.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

FID_POOL_DIM = 2048


class BasicConv(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.strides), padding=self.padding,
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
        return nn.relu(x)


def _avg_pool_nopad(x, window=3):
    """3x3 stride-1 average pooling that EXCLUDES padding from the count
    (count_include_pad=False — the FID network's modification,
    reference inception.py FIDInceptionA/C/E)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    s = nn.avg_pool(x, (window, window), strides=(1, 1), padding="SAME")
    c = nn.avg_pool(ones, (window, window), strides=(1, 1), padding="SAME")
    return s / jnp.maximum(c, 1e-8)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), padding="VALID",
                       name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), padding="VALID",
                       name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), padding="VALID",
                       name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), padding="VALID",
                       name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # FID E-1 uses nopad-avg; E-2 uses max

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_nopad(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3 trunk up to the 2048-dim pool3 features.

    Input: NHWC float images. With `resize_input`, bilinear-resize to
    299x299; with `normalize_input`, map [0,1] -> [-1,1] (reference
    inception.py constructor semantics)."""
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv(32, (3, 3), strides=(2, 2), padding="VALID",
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), padding="VALID", name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), padding="VALID", name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), padding="VALID", name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]


def convert_torch_state_dict(state_dict) -> dict:
    """Convert a pytorch-fid InceptionV3 state dict (torch tensors or numpy)
    to this module's flax params/batch_stats trees. Conv weights transpose
    OIHW -> HWIO; BN running stats map to batch_stats."""
    import numpy as np

    params, stats = {}, {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for key, val in state_dict.items():
        v = np.asarray(val)
        parts = key.split(".")
        # torch names like Mixed_5b.branch1x1.conv.weight
        mod_path = parts[:-2] if parts[-2] in ("conv", "bn") else parts[:-1]
        flax_path = list(mod_path)
        leaf = parts[-1]
        kind = parts[-2] if len(parts) >= 2 else ""
        if kind == "conv" and leaf == "weight":
            put(params, flax_path + ["Conv_0", "kernel"],
                v.transpose(2, 3, 1, 0))
        elif kind == "bn" and leaf == "weight":
            put(params, flax_path + ["BatchNorm_0", "scale"], v)
        elif kind == "bn" and leaf == "bias":
            put(params, flax_path + ["BatchNorm_0", "bias"], v)
        elif kind == "bn" and leaf == "running_mean":
            put(stats, flax_path + ["BatchNorm_0", "mean"], v)
        elif kind == "bn" and leaf == "running_var":
            put(stats, flax_path + ["BatchNorm_0", "var"], v)
    return {"params": params, "batch_stats": stats}

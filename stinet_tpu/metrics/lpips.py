"""LPIPS perceptual metric (AlexNet backbone) — parity target: the
`lpips(alex)` metric tracked by the reference 2D trainer
(/root/reference/trainers/inpainting2d_trainer.py:158-167 via the lpips
package). Architecture per Zhang et al. 2018: AlexNet conv features at 5
stages, channel-unit-normalized, squared differences reduced by learned 1x1
linear heads, spatially averaged and summed over stages.

Weights (both the AlexNet trunk and the LPIPS linear heads) convert from the
torch packages with `convert_torch_lpips`; without them the metric runs with
random features (relative trends only — flagged by the caller)."""
import jax
import jax.numpy as jnp
import flax.linen as nn

# plain tuples: module-level jnp arrays would initialize the device backend
# at import time
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# AlexNet feature config: (out_c, kernel, stride, pad)
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
         (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}  # maxpool after stages 0 and 1 (and before 2)


class AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (c, k, s, p) in enumerate(_ALEX):
            x = nn.Conv(c, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv_{i}")(x)
            x = nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPS:
    def __init__(self, variables, lin_weights=None):
        self.module = AlexFeatures()
        self.variables = variables
        self.lin_weights = lin_weights  # list of [C] arrays or None

    def _norm_feat(self, f):
        return f / jnp.sqrt(
            jnp.sum(f ** 2, axis=-1, keepdims=True) + 1e-10)

    def __call__(self, x, y):
        """x, y: [N, H, W, 3] in [-1, 1]. Returns [N] distances."""
        if min(x.shape[1], x.shape[2]) < 32:
            raise ValueError(
                f"LPIPS(alex) needs images >= 32px per side, got "
                f"{x.shape[1]}x{x.shape[2]} (the stride-4 trunk collapses "
                "smaller inputs to empty feature maps)")
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        x = (x - shift) / scale
        y = (y - shift) / scale
        fx = self.module.apply(self.variables, x)
        fy = self.module.apply(self.variables, y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (self._norm_feat(a) - self._norm_feat(b)) ** 2
            if self.lin_weights is not None:
                d = d * jnp.maximum(self.lin_weights[i], 0.0)
                total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
            else:
                total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def convert_torch_lpips(alex_state_dict, lpips_state_dict=None):
    """torchvision alexnet.features + lpips lin weights -> flax trees.

    Accepts any of the key layouts in the wild: 'features.N.weight' /
    'N.weight' (torchvision alexnet), 'net.sliceK.N.weight' (the lpips
    package's sliced copy), and 'lin{i}.model.1.weight' (lpips linear
    heads). Missing lin keys yield lins=None (unweighted stage means)."""
    import numpy as np
    conv_torch_idx = [0, 3, 6, 8, 10]
    params = {}
    for i, ti in enumerate(conv_torch_idx):
        for prefix in (f"features.{ti}", str(ti), f"net.slice{i + 1}.{ti}"):
            wkey = prefix + ".weight"
            if wkey in alex_state_dict:
                params[f"conv_{i}"] = {
                    "kernel": np.asarray(
                        alex_state_dict[wkey]).transpose(2, 3, 1, 0),
                    "bias": np.asarray(alex_state_dict[prefix + ".bias"]),
                }
                break
        else:
            raise KeyError(
                f"AlexNet conv {i} (torch features index {ti}) not found in "
                "state dict")
    lins = None
    if lpips_state_dict is not None and \
            "lin0.model.1.weight" in lpips_state_dict:
        lins = []
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            lins.append(np.asarray(lpips_state_dict[key]).reshape(-1))
    return {"params": params}, lins


def random_lpips(img_size=64, seed=0):
    """LPIPS with randomly initialized AlexNet features (plumbing/tests)."""
    module = AlexFeatures()
    variables = module.init(jax.random.key(seed),
                            jnp.zeros((1, img_size, img_size, 3)))
    return LPIPS(variables)

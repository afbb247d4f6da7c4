"""VGG16 perceptual loss — capability parity with
/root/reference/models/losses/vgg16.py: feature slices at relu1_2 / relu2_2 /
relu3_3 / relu4_3, input remapped from [-0.5, 0.5] to [0, 1], BGR channel
swap, ImageNet normalization, antialiased resize to 224, content loss with
layer weights [0.125, 0.25, 0.5, 1.0] and Gram-matrix style loss.

NHWC flax; pretrained torchvision weights are converted offline with
`convert_torch_vgg16` (no download possible in this environment; without
weights the loss still runs for plumbing tests)."""
import jax.numpy as jnp
import flax.linen as nn

# torchvision vgg16.features conv layout (out-channels per conv, 'M' = pool)
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512, "M"]
# slice boundaries in torchvision feature indices: 4, 9, 16, 23
_SLICE_AFTER_CONV = (2, 4, 7, 10)  # relu1_2, relu2_2, relu3_3, relu4_3

# plain tuples (no device allocation at import)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
LAYER_WEIGHTS = (0.125, 0.25, 0.5, 1.0)


class VGG16Features(nn.Module):
    """Returns the four reference feature slices for NHWC input in the
    VGG-normalized domain."""

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_idx = 0
        for c in _CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(c, (3, 3), padding="SAME",
                        name=f"conv_{conv_idx}")(x)
            x = nn.relu(x)
            conv_idx += 1
            if conv_idx in _SLICE_AFTER_CONV:
                feats.append(x)
            if len(feats) == 4:
                break
        return feats


def gram_matrix(feat):
    """[N, H, W, C] -> [N, C, C] normalized Gram (reference vgg16.py:56-60)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    return jnp.einsum("nic,nid->ncd", f, f) / (c * h * w)


class VGGLoss:
    """(content, style) losses between prediction and target images in
    [-1, 1] NHWC (reference VGGLOSS, vgg16.py:56-78)."""

    def __init__(self, variables, resize_to: int = 224):
        self.variables = variables
        self.module = VGG16Features()
        self.resize_to = resize_to

    def _prep(self, img):
        # the reference maps with clamp(X + 0.5, 0, 1) — a [-0.5, 0.5]
        # domain mapper that SATURATES on the [-1, 1] images its trainer
        # actually feeds it (vgg16.py:30; imagegraph Normalize is [-1, 1]).
        # Parity means replicating the saturation, not rescaling.
        img = jnp.clip(img + 0.5, 0.0, 1.0)
        img = img[..., ::-1]
        img = ((img - jnp.asarray(_IMAGENET_MEAN, img.dtype))
               / jnp.asarray(_IMAGENET_STD, img.dtype))
        # resize_right-parity cubic resize (the reference's default kernel,
        # /root/reference/utils/resize_right.py:32) as two MXU matmuls
        from stinet_tpu.ops.resize import resize_image
        return resize_image(img, (self.resize_to, self.resize_to))

    def __call__(self, pred, target):
        fp = self.module.apply(self.variables, self._prep(pred))
        ft = self.module.apply(self.variables, self._prep(target))
        content = 0.0
        style = 0.0
        for w, a, b in zip(LAYER_WEIGHTS, fp, ft):
            content = content + w * jnp.mean(jnp.abs(a - b))
            style = style + w * jnp.mean(
                jnp.abs(gram_matrix(a) - gram_matrix(b)))
        return content, style


def convert_torch_vgg16(state_dict) -> dict:
    """torchvision vgg16 `features` state dict -> flax params (OIHW->HWIO).
    Accepts keys like 'features.0.weight' or '0.weight'."""
    import numpy as np
    conv_torch_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for i, ti in enumerate(conv_torch_indices[:10]):  # up to relu4_3
        for prefix in (f"features.{ti}", str(ti)):
            wkey, bkey = prefix + ".weight", prefix + ".bias"
            if wkey in state_dict:
                w = np.asarray(state_dict[wkey]).transpose(2, 3, 1, 0)
                params[f"conv_{i}"] = {
                    "kernel": w, "bias": np.asarray(state_dict[bkey])}
                break
    return {"params": params}

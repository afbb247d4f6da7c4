"""GAN network zoo + losses — capability parity with the reference's
pix2pix/CycleGAN-derived module (/root/reference/models/gan_networks.py):
ResnetGenerator, UnetGenerator, NLayerDiscriminator (PatchGAN),
PixelDiscriminator, GANLoss (lsgan | vanilla | wgangp), gradient penalty and
LR schedulers. NHWC flax modules; losses are pure jax functions usable inside
a jitted two-optimizer train step."""
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from stinet_tpu.models.resnet2d import Conv, Norm2D, ResnetBlock2D, _pad2d
from stinet_tpu.models.stinet import torch_linear_init


class ResnetGenerator(nn.Module):
    """Resnet generator: downsampling -> n_blocks resnet -> upsampling
    (reference gan_networks.py:325-392)."""
    input_nc: int
    output_nc: int
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    n_blocks: int = 6
    padding_type: str = "reflect"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        use_bias = self.norm == "instance"
        x = _pad2d(x, 3, self.padding_type)
        x = Conv(self.ngf, (7, 7), padding="VALID", use_bias=use_bias,
                 dtype=self.dtype)(x)
        x = Norm2D(self.ngf, self.norm)(x, train)
        x = nn.relu(x)
        for i in range(2):  # downsampling
            mult = 2 ** i
            x = Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)), use_bias=use_bias,
                     dtype=self.dtype)(x)
            x = Norm2D(self.ngf * mult * 2, self.norm)(x, train)
            x = nn.relu(x)
        mult = 4
        for i in range(self.n_blocks):
            x = ResnetBlock2D(self.ngf * mult, self.ngf * mult, self.norm,
                              padding_type=self.padding_type,
                              use_dropout=self.use_dropout,
                              use_bias=use_bias, dtype=self.dtype)(x, train)
        for i in range(2):  # upsampling
            mult = 2 ** (2 - i)
            x = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)), use_bias=use_bias,
                                 kernel_init=torch_linear_init,
                                 dtype=self.dtype)(x)
            x = Norm2D(self.ngf * mult // 2, self.norm)(x, train)
            x = nn.relu(x)
        x = _pad2d(x, 3, self.padding_type)
        x = Conv(self.output_nc, (7, 7), padding="VALID",
                 dtype=self.dtype)(x)
        return jnp.tanh(x)


class UnetGenerator(nn.Module):
    """U-Net generator built from the innermost layer outward
    (reference gan_networks.py:456-555)."""
    input_nc: int
    output_nc: int
    num_downs: int = 7
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        use_bias = self.norm == "instance"

        def down(x, out_c, norm=True):
            x = nn.leaky_relu(x, 0.2) if norm != "outermost" else x
            x = Conv(out_c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=use_bias, dtype=self.dtype)(x)
            if norm is True:
                x = Norm2D(out_c, self.norm)(x, train)
            return x

        def up(x, out_c, norm=True, dropout=False):
            x = nn.relu(x)
            x = nn.ConvTranspose(out_c, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)),
                                 use_bias=use_bias,
                                 kernel_init=torch_linear_init,
                                 dtype=self.dtype)(x)
            if norm:
                x = Norm2D(out_c, self.norm)(x, train)
            if dropout and self.use_dropout:
                x = nn.Dropout(0.5, deterministic=not train)(x)
            return x

        ngf = self.ngf
        chans = [ngf, ngf * 2, ngf * 4] + [ngf * 8] * (self.num_downs - 3)
        skips = []
        h = Conv(chans[0], (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                 use_bias=use_bias, dtype=self.dtype)(x)
        skips.append(h)
        for c in chans[1:]:
            h = down(h, c)
            skips.append(h)
        h = skips.pop()
        first = True
        for c in reversed(chans[:-1]):
            h = up(h, c, dropout=not first)
            first = False
            h = jnp.concatenate([skips.pop(), h], axis=-1)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.output_nc, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)),
                             kernel_init=torch_linear_init,
                             dtype=self.dtype)(h)
        return jnp.tanh(h)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference gan_networks.py:558-603)."""
    input_nc: int
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        use_bias = self.norm == "instance"
        x = Conv(self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                 dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2),
                     padding=((1, 1), (1, 1)), use_bias=use_bias,
                     dtype=self.dtype)(x)
            x = Norm2D(self.ndf * nf_mult, self.norm)(x, train)
            x = nn.leaky_relu(x, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1),
                 padding=((1, 1), (1, 1)), use_bias=use_bias,
                 dtype=self.dtype)(x)
        x = Norm2D(self.ndf * nf_mult, self.norm)(x, train)
        x = nn.leaky_relu(x, 0.2)
        return Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (reference gan_networks.py:606-635)."""
    input_nc: int
    ndf: int = 64
    norm: str = "batch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        use_bias = self.norm == "instance"
        x = Conv(self.ndf, (1, 1), dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = Conv(self.ndf * 2, (1, 1), use_bias=use_bias,
                 dtype=self.dtype)(x)
        x = Norm2D(self.ndf * 2, self.norm)(x, train)
        x = nn.leaky_relu(x, 0.2)
        return Conv(1, (1, 1), use_bias=use_bias, dtype=self.dtype)(x)


# ---------------------------- losses --------------------------------------

def gan_loss(prediction, target_is_real: bool, gan_mode: str = "lsgan"):
    """GANLoss parity (reference gan_networks.py:219-285): lsgan = MSE vs
    0/1 target, vanilla = BCE-with-logits, wgangp = +-mean."""
    if gan_mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((prediction - target) ** 2)
    if gan_mode == "vanilla":
        target = jnp.ones_like(prediction) if target_is_real \
            else jnp.zeros_like(prediction)
        return jnp.mean(
            jnp.maximum(prediction, 0) - prediction * target
            + jnp.log1p(jnp.exp(-jnp.abs(prediction))))
    if gan_mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real \
            else jnp.mean(prediction)
    raise NotImplementedError(f"gan mode {gan_mode!r} not implemented")


def cal_gradient_penalty(disc_apply, params, real, fake, key,
                         constant=1.0, lambda_gp=10.0, gp_type="mixed"):
    """WGAN-GP gradient penalty (reference gan_networks.py:288-322)."""
    if gp_type == "real":
        interp = real
    elif gp_type == "fake":
        interp = fake
    else:
        alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        interp = alpha * real + (1 - alpha) * fake

    def disc_sum(x):
        return jnp.sum(disc_apply(params, x))

    grads = jax.grad(disc_sum)(interp)
    grads = grads.reshape(grads.shape[0], -1)
    gnorm = jnp.sqrt(jnp.sum(grads ** 2, axis=1) + 1e-16)
    return jnp.mean((gnorm - constant) ** 2) * lambda_gp


def get_scheduler(policy: str, args, n_epochs=100):
    """LR schedule factory: epoch -> multiplier (reference
    gan_networks.py:39-65 linear | step | cosine; plateau needs a metric and
    is handled by the trainer)."""
    import math
    if policy == "linear":
        n_keep = args.get("n_epochs", n_epochs)
        n_decay = args.get("n_epochs_decay", 100)

        def fn(epoch):
            return 1.0 - max(0, epoch - n_keep) / float(n_decay + 1)
        return fn
    if policy == "step":
        step_size = args.get("step_size", args.get("lr_decay_iters", 50))
        gamma = args.get("gamma", 0.1)

        def fn(epoch):
            return gamma ** (epoch // step_size)
        return fn
    if policy == "cosine":
        total = args.get("n_epochs", n_epochs)

        def fn(epoch):
            return 0.5 * (1 + math.cos(math.pi * epoch / total))
        return fn
    if policy == "plateau":
        # reference gan_networks.py:57-59: ReduceLROnPlateau(mode='min',
        # factor=0.2, threshold=0.01, patience=5); returns a stateful
        # multiplier — the trainer feeds the monitored metric via observe()
        from stinet_tpu.trainers.graph_common import PlateauLR
        return PlateauLR(1.0, mode="min", factor=0.2, threshold=0.01,
                         patience=5)
    raise NotImplementedError(f"lr policy {policy!r} not implemented")

"""Resnet2D — the conventional conv2d baseline generator used by the 2D
inpainting workload for graph-vs-CNN comparisons (reference
/root/reference/models/surfacetextureinpaintingnet.py:524-659).

NHWC layout (TPU-native). Supports the reference's conv knobs: io receptive
field type (large=7x7 | normal=3x3 | dilated), reflect/replicate/zero
padding, stride vs mean/max-pool downsampling, transpose-conv vs nearest
upsampling, and exponentially-dilated interior ResNet blocks (d_start
schedule at reference :575-583).
"""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from stinet_tpu.models.stinet import torch_linear_init

_PAD_MODE = {"reflect": "reflect", "replicate": "edge", "zero": None}


class Conv(nn.Conv):
    kernel_init: nn.initializers.Initializer = torch_linear_init
    bias_init: nn.initializers.Initializer = nn.initializers.zeros


def _pad2d(x, p, padding_type):
    mode = _PAD_MODE[padding_type]
    if p == 0:
        return x
    if mode is None:
        return x  # zero padding handled inside the conv
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)


class Norm2D(nn.Module):
    """batch: affine + running stats; instance: per-sample HW standardization
    (no affine, no running stats); none: identity — matching get_norm_layer
    (reference surfacetextureinpaintingnet.py:84-101)."""
    features: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train=False):
        if self.norm == "none":
            return x
        if self.norm == "instance":
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
            return (x - mean) / jnp.sqrt(var + 1e-5)
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5)(x)
        raise NotImplementedError(self.norm)


class ForwardConv(nn.Module):
    """n_repeated same-size convs (reference forward_conv, :18-48)."""
    in_c: int
    out_c: int
    n_repeated: int = 1
    dilation: int = 1
    receptive_field_type: str = "normal"
    padding_type: str = "zero"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.receptive_field_type == "large":
            k, p = 7, 3
        elif self.receptive_field_type == "dilated":
            k, p = 3, self.dilation
        elif self.receptive_field_type == "normal":
            k, p = 3, 1
        else:
            raise NotImplementedError(self.receptive_field_type)
        for i in range(self.n_repeated):
            out_c = self.out_c if i == self.n_repeated - 1 else self.in_c
            x = _pad2d(x, p, self.padding_type)
            pad = ((p, p), (p, p)) if self.padding_type == "zero" else "VALID"
            x = Conv(out_c, (k, k), padding=pad,
                     kernel_dilation=(self.dilation, self.dilation),
                     use_bias=self.use_bias, dtype=self.dtype)(x)
        return x


class ResnetBlock2D(nn.Module):
    """conv(dilated) -> norm -> ReLU (+dropout) with 1x1-projected residual
    (reference ResnetBlock, :604-659)."""
    dim_in: int
    dim_out: int
    norm: str
    padding_type: str = "reflect"
    use_dropout: bool = False
    use_bias: bool = True
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        out = ForwardConv(self.dim_in, self.dim_out,
                          receptive_field_type="dilated",
                          dilation=self.dilation,
                          padding_type=self.padding_type,
                          use_bias=self.use_bias, dtype=self.dtype)(x)
        out = Norm2D(self.dim_out, self.norm)(out, train)
        out = nn.relu(out)
        if self.use_dropout:
            out = nn.Dropout(0.5, deterministic=not train)(out)
        if self.dim_in != self.dim_out:
            x = Conv(self.dim_out, (1, 1), use_bias=self.use_bias,
                     dtype=self.dtype)(x)
        return x + out


class Resnet2D(nn.Module):
    input_nc: int
    output_nc: int = 3
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 6
    dilation_order: int = 0
    n_levels: int = 2
    n_repeated_io_convs: int = 1
    padding_type: str = "reflect"
    pooling_type: str = "stride"
    io_receptive_field_type: str = "large"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        """x: [B, H, W, input_nc] -> [B, H, W, output_nc] in [-1, 1]."""
        assert self.dilation_order < self.n_blocks
        use_bias = self.norm == "instance"
        ngf = self.ngf

        x = ForwardConv(self.input_nc, ngf,
                        n_repeated=self.n_repeated_io_convs,
                        receptive_field_type=self.io_receptive_field_type,
                        padding_type=self.padding_type, use_bias=use_bias,
                        dtype=self.dtype)(x)
        x = Norm2D(ngf, self.norm)(x, train)
        x = nn.relu(x)

        for i in range(self.n_levels):
            mult = 2 ** i
            out_c = ngf * mult * 2
            if self.pooling_type == "stride":
                x = Conv(out_c, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)), use_bias=use_bias,
                         dtype=self.dtype)(x)
            else:
                if self.pooling_type == "mean":
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                elif self.pooling_type == "max":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    raise NotImplementedError(self.pooling_type)
                x = ForwardConv(ngf * mult, out_c, use_bias=use_bias,
                                dtype=self.dtype)(x)
            x = Norm2D(out_c, self.norm)(x, train)
            x = nn.relu(x)

        mult = 2 ** self.n_levels
        d_start = self.n_blocks - self.dilation_order - 1
        for i in range(self.n_blocks):
            dilation = (2 ** (i - d_start)
                        if d_start <= i <= d_start + self.dilation_order
                        else 1)
            x = ResnetBlock2D(ngf * mult, ngf * mult, self.norm,
                              padding_type=self.padding_type,
                              use_dropout=self.use_dropout,
                              use_bias=use_bias, dilation=dilation,
                              dtype=self.dtype)(x, train)

        for i in range(self.n_levels):
            mult = 2 ** (self.n_levels - i)
            out_c = ngf * mult // 2
            if self.pooling_type == "stride":
                x = nn.ConvTranspose(out_c, (3, 3), strides=(2, 2),
                                     padding=((1, 2), (1, 2)),
                                     use_bias=use_bias, dtype=self.dtype,
                                     kernel_init=torch_linear_init)(x)
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = ForwardConv(ngf * mult, out_c, use_bias=use_bias,
                                dtype=self.dtype)(x)
            x = Norm2D(out_c, self.norm)(x, train)
            x = nn.relu(x)

        x = ForwardConv(ngf, self.output_nc,
                        n_repeated=self.n_repeated_io_convs,
                        receptive_field_type=self.io_receptive_field_type,
                        padding_type=self.padding_type, use_bias=True,
                        dtype=self.dtype)(x)
        return jnp.tanh(x)

"""Generator/discriminator factories — config surface parity with the
reference define_G/define_D (/root/reference/models/
surfacetextureinpaintingnet.py:157-199, gan_networks.py:120-213). Torch-only
knobs (init_type/init_gain/gpu_ids) are accepted and ignored: flax modules
initialize at first apply with torch-compatible initializers."""
import jax
import numpy as np


def _resolve_dtype(dtype):
    """JSON configs pass dtypes as strings ('bfloat16' | 'float32')."""
    if dtype is None or not isinstance(dtype, str):
        return dtype
    import jax.numpy as jnp
    return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "f32": jnp.float32}[dtype]


def define_G(input_nc, output_nc, ngf, filter_type, norm="batch",
             dilation_order=0, use_dropout=False, n_blocks=6, n_levels=2,
             n_repeated_io_convs=1, init_type="normal", pooling_type="stride",
             io_receptive_field_type="large", checkpoint_bottleneck=False,
             num_blocks_per_uncheckpointed_block=1, use_label_embedding=False,
             num_classes=None, num_embedding=None, dilations=None,
             init_gain=0.02, gpu_ids=(), dtype=None, remat_io_blocks=True):
    dtype = _resolve_dtype(dtype)
    if filter_type == "conv2d":
        from stinet_tpu.models.resnet2d import Resnet2D
        return Resnet2D(
            input_nc=input_nc, output_nc=output_nc, ngf=ngf, norm=norm,
            use_dropout=use_dropout, n_blocks=n_blocks, n_levels=n_levels,
            dilation_order=dilation_order,
            n_repeated_io_convs=n_repeated_io_convs,
            pooling_type=pooling_type,
            io_receptive_field_type=io_receptive_field_type, dtype=dtype)
    from stinet_tpu.models.stinet import SurfaceTextureInpaintingNet
    return SurfaceTextureInpaintingNet(
        input_nc=input_nc, output_nc=output_nc, ngf=ngf,
        filter_type=filter_type, norm=norm, n_blocks=n_blocks,
        n_levels=n_levels, n_repeated_io_convs=n_repeated_io_convs,
        pooling_type=pooling_type,
        dilations=tuple(dilations) if dilations is not None else None,
        checkpoint_bottleneck=checkpoint_bottleneck,
        num_blocks_per_uncheckpointed_block=num_blocks_per_uncheckpointed_block,
        use_label_embedding=use_label_embedding, num_classes=num_classes,
        num_embedding=num_embedding,
        remat_io_blocks=remat_io_blocks, dtype=dtype)


def define_D(input_nc, ndf, netD, n_layers_D=3, norm="batch",
             init_type="normal", init_gain=0.02, gpu_ids=(), dtype=None):
    dtype = _resolve_dtype(dtype)
    from stinet_tpu.models.gan_networks import (
        NLayerDiscriminator, PixelDiscriminator)
    if netD == "basic":
        return NLayerDiscriminator(input_nc=input_nc, ndf=ndf, n_layers=3,
                                   norm=norm, dtype=dtype)
    if netD == "n_layers":
        return NLayerDiscriminator(input_nc=input_nc, ndf=ndf,
                                   n_layers=n_layers_D, norm=norm,
                                   dtype=dtype)
    if netD == "pixel":
        return PixelDiscriminator(input_nc=input_nc, ndf=ndf, norm=norm,
                                  dtype=dtype)
    raise NotImplementedError(
        f"Discriminator model name {netD!r} is not recognized")


def count_parameters(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))

"""Reference-checkpoint conversion: a torch state dict in the reference's
key layout converts to params that drive the flax STINet to the same outputs
as the dense oracle run with those weights."""
import jax
import numpy as np
import torch

from stinet_tpu.graph import build_hierarchical_graph
from stinet_tpu.models.stinet import SurfaceTextureInpaintingNet
from stinet_tpu.utils.convert_reference_checkpoint import (
    convert_stinet_state_dict)

from tests.test_stinet_model import CFG, make_sample, np_stinet_forward, to_np


def reference_style_state_dict(params):
    """Build a torch state dict in the REFERENCE's key layout carrying the
    given flax params (the inverse mapping), standing in for a real trained
    .pth file."""
    sd = {}
    blocks = {"input_block_0": "input_blocks.0",
              "encoder_block_0": "encoder_blocks.0",
              "encoder_block_1": "encoder_blocks.1",
              "bottleneck_block_0": "bottleneck_blocks.0",
              "bottleneck_block_1": "bottleneck_blocks.1",
              "decoder_block_0": "decoder_blocks.0",
              "decoder_block_1": "decoder_blocks.1",
              "output_block_0": "output_blocks.0"}
    for flax_name, torch_name in blocks.items():
        b = params[flax_name]
        ff = b["first_filter"]
        sd[f"{torch_name}.first_filter.nn.0.weight"] = torch.from_numpy(
            np.asarray(ff["lin1_kernel"]).T.copy())
        sd[f"{torch_name}.first_filter.nn.0.bias"] = torch.from_numpy(
            np.asarray(ff["lin1_bias"]).copy())
        sd[f"{torch_name}.first_filter.nn.2.weight"] = torch.from_numpy(
            np.asarray(ff["lin2"]["kernel"]).T.copy())
        sd[f"{torch_name}.first_filter.nn.2.bias"] = torch.from_numpy(
            np.asarray(ff["lin2"]["bias"]).copy())
        if "shortcut" in b:
            sd[f"{torch_name}.shortcut.weight"] = torch.from_numpy(
                np.asarray(b["shortcut"]["kernel"]).T.copy())
            sd[f"{torch_name}.shortcut.bias"] = torch.from_numpy(
                np.asarray(b["shortcut"]["bias"]).copy())
    for lin in ("final_linear1", "final_linear2"):
        sd[f"{lin}.weight"] = torch.from_numpy(
            np.asarray(params[lin]["kernel"]).T.copy())
        sd[f"{lin}.bias"] = torch.from_numpy(
            np.asarray(params[lin]["bias"]).copy())
    return sd


def test_conversion_roundtrip_and_forward(rng):
    samples = [make_sample(rng)]
    g = build_hierarchical_graph(samples)
    model = SurfaceTextureInpaintingNet(**CFG)
    params0 = model.init(jax.random.key(1), g)["params"]

    sd = reference_style_state_dict(params0)
    params, stats = convert_stinet_state_dict(sd)
    assert not stats  # instance norm: no running stats

    # converted params match the originals leaf-for-leaf
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    assert len(flat0) == len(flat1)
    for path, leaf in flat0:
        np.testing.assert_allclose(np.asarray(flat1[path]),
                                   np.asarray(leaf), rtol=1e-6)

    # and drive the model to oracle-identical outputs
    import jax.numpy as jnp
    params = jax.tree.map(jnp.asarray, params)
    got = np.asarray(model.apply({"params": params}, g))
    want = np_stinet_forward(to_np(params0), samples, CFG)
    n = int(g.levels[0].num_vertices)
    d = np.abs(got[:n] - want)
    assert d.max() < 0.15 and d.mean() < 0.02
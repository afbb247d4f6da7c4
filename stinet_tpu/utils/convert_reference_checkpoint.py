"""Convert a reference STINet torch checkpoint into this framework's params.

The reference saves {archs, state_dicts: {'graph': state_dict}, ...}
(inpainting3d_trainer.py:315-337) where the state dict keys follow its module
tree: `input_blocks.{i}.first_filter.nn.{0,2}.{weight,bias}`,
`encoder_blocks/bottleneck_blocks/decoder_blocks/output_blocks` likewise,
`*.shortcut.{weight,bias}`, `final_linear{1,2}.{weight,bias}` (and for
norm='batch', `*.first_norm.module.{weight,bias,running_mean,running_var}`).

Mapping to stinet_tpu params (models/stinet.py):
  nn.0.weight [2H, C*]  -> first_filter/lin1_kernel [C*, 2H]   (transpose)
  nn.0.bias             -> first_filter/lin1_bias
  nn.2.weight [Co, 2H]  -> first_filter/lin2/kernel [2H, Co]   (transpose)
  nn.2.bias             -> first_filter/lin2/bias
  shortcut.weight       -> shortcut/kernel (transpose), bias -> bias
  final_linear{1,2}     -> final_linear{1,2}/kernel (transpose) + bias
The torch EdgeConv input concat order [x_i | x_j - x_i] matches the
row-block convention of the algebraic decomposition (W_i rows first), so no
reordering beyond the transpose is needed.
"""
import numpy as np

_BLOCK_MAP = {
    "input_blocks": "input_block_{}",
    "encoder_blocks": "encoder_block_{}",
    "bottleneck_blocks": "bottleneck_block_{}",
    "decoder_blocks": "decoder_block_{}",
    "output_blocks": "output_block_{}",
}


def _put(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_stinet_state_dict(state_dict):
    """torch state dict (tensors or arrays) -> (params, batch_stats)."""
    params, stats = {}, {}
    for key, val in state_dict.items():
        v = np.asarray(getattr(val, "numpy", lambda: val)()
                       if hasattr(val, "numpy") else val, np.float32)
        parts = key.split(".")
        if parts[0] in _BLOCK_MAP:
            block = _BLOCK_MAP[parts[0]].format(parts[1])
            rest = parts[2:]
            if rest[0] == "first_filter" and rest[1] == "nn":
                idx, leaf = rest[2], rest[3]
                if idx == "0":
                    name = "lin1_kernel" if leaf == "weight" else "lin1_bias"
                    _put(params, [block, "first_filter", name],
                         v.T if leaf == "weight" else v)
                else:  # the post-activation linear
                    _put(params, [block, "first_filter", "lin2",
                                  "kernel" if leaf == "weight" else "bias"],
                         v.T if leaf == "weight" else v)
            elif rest[0] == "shortcut":
                _put(params, [block, "shortcut",
                              "kernel" if rest[1] == "weight" else "bias"],
                     v.T if rest[1] == "weight" else v)
            elif rest[0] == "first_norm":
                leaf = rest[-1]
                if leaf == "weight":
                    _put(params, [block, "first_norm", "scale"], v)
                elif leaf == "bias":
                    _put(params, [block, "first_norm", "bias"], v)
                elif leaf == "running_mean":
                    _put(stats, [block, "first_norm", "mean"], v)
                elif leaf == "running_var":
                    _put(stats, [block, "first_norm", "var"], v)
                elif leaf == "mean_scale":  # graph norm
                    _put(params, [block, "first_norm", "mean_scale"], v)
        elif parts[0] in ("final_linear1", "final_linear2"):
            _put(params, [parts[0],
                          "kernel" if parts[1] == "weight" else "bias"],
                 v.T if parts[1] == "weight" else v)
        elif parts[0] == "final_norm1":
            leaf = parts[-1]
            if leaf == "weight":
                _put(params, ["final_norm1", "scale"], v)
            elif leaf == "bias":
                _put(params, ["final_norm1", "bias"], v)
            elif leaf == "mean_scale":
                _put(params, ["final_norm1", "mean_scale"], v)
        # instance norm (affine=False) carries no tensors; anything else is
        # intentionally skipped (e.g. num_batches_tracked)
    return params, stats


def convert_reference_checkpoint(path, model_key="graph"):
    """Load a reference .pth checkpoint file and convert the named model."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["state_dicts"][model_key] \
        if "state_dicts" in ckpt else ckpt["state_dict"]
    return convert_stinet_state_dict(state_dict)

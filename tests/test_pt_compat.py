"""Reference .pt graph-file compatibility: the loader accepts torch dicts in
the reference's on-disk schema (vertices/edges/traces/dilated_edges lists,
scannetcolorgraph_dataloader.py:89-104)."""
import os

import numpy as np
import torch

from stinet_tpu.data.scannet import load_scene_pt


def test_load_reference_pt_format(tmp_path, rng):
    nv = [60, 20, 8]
    saved = {
        "vertices": [torch.from_numpy(
            rng.normal(size=(v, 10)).astype(np.float32)) for v in nv],
        # reference stores edges row-wise [E, 2]
        "edges": [torch.from_numpy(
            rng.integers(0, v, size=(4 * v, 2)).astype(np.int64))
            for v in nv],
        "traces": [
            torch.from_numpy(np.arange(nv[0]).astype(np.int64)),
            torch.from_numpy(rng.integers(0, nv[1], nv[0]).astype(np.int64)),
            torch.from_numpy(rng.integers(0, nv[2], nv[1]).astype(np.int64)),
        ],
        "dilated_edges": [
            None, None,
            [torch.from_numpy(
                rng.integers(0, nv[2], size=(10, 2)).astype(np.int64)),
             torch.zeros((0, 2), dtype=torch.long)],  # dist 4 missing
        ],
        "dilation_dists": [2, 4],
    }
    path = tmp_path / "scene0000_00.pt"
    torch.save(saved, path)

    vertices, edges, traces, dilated, dists, _ = load_scene_pt(str(path), 3)
    assert len(vertices) == 3 and vertices[0].shape == (60, 10)
    assert edges[0].shape == (2, 240)
    assert traces[1].shape == (60,)
    assert dists == [2, 4]
    assert 2 in dilated[2]
    # missing dist falls back to the previous one
    # (reference scannetcolorgraph_dataloader.py:138-144)
    assert 4 in dilated[2]
    np.testing.assert_array_equal(dilated[2][4], dilated[2][2])
"""Active label-embedding conditioning (use_label_embedding): the reference
constructs the embedding and widens the first ENCODER block
(surfacetextureinpaintingnet.py:277-278,322-323) with the concat sitting
after the input blocks (:409-410, commented there) — here that wiring is
live, with torch padding_idx=0 semantics (label 0 embeds to the zero
vector, its row gets no gradient)."""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stinet_tpu.graph.build import build_hierarchical_graph  # noqa: E402
from stinet_tpu.models.factory import define_G  # noqa: E402
from stinet_tpu.utils.synthetic import synthetic_scene  # noqa: E402


def _graph_with_labels(v=512, num_classes=5, seed=0):
    scene = synthetic_scene(num_vertices=v, levels=3, seed=seed,
                            dilation_dists=(2,))
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=v).astype(np.int64)
    labels[: v // 4] = 0  # a padding-label region
    scene = dataclasses.replace(scene, labels=labels)
    return build_hierarchical_graph([scene])


def _model(**kw):
    return define_G(input_nc=10, output_nc=3, ngf=8, n_blocks=2,
                    dilations=[1, 2], norm="instance", pooling_type="max",
                    n_levels=2, n_repeated_io_convs=2,
                    filter_type="edgeconvtransinv", **kw)


def test_label_embedding_forward_and_padding_row():
    g = _graph_with_labels()
    model = _model(use_label_embedding=True, num_classes=5, num_embedding=4)
    params = jax.jit(model.init)(jax.random.key(0), g)["params"]
    emb_table = params["label_embedding"]["embedding"]
    assert emb_table.shape == (5, 4)

    # reference wiring: the concat happens AFTER the input blocks, so
    # input_block_0 stays at input_nc and ENCODER block 0 widens by
    # num_embedding (surfacetextureinpaintingnet.py:322-323)
    def _first_filter_in(block):
        return block["first_filter"]["lin1_kernel"].shape[0]
    assert _first_filter_in(params["input_block_0"]) == 10  # trans-inv: C_in
    assert _first_filter_in(params["encoder_block_0"]) == 2 * (8 + 4)

    out = jax.jit(lambda p, g: model.apply({"params": p}, g))(params, g)
    assert np.isfinite(np.asarray(out)).all()

    # padding semantics: zeroing row 0 of the table must not change outputs
    # (label-0 vertices embed to zeros regardless of the row's values)
    p2 = jax.tree.map(lambda x: x, params)
    p2["label_embedding"] = {"embedding": emb_table.at[0].set(123.0)}
    out2 = model.apply({"params": p2}, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=0)

    # ...and row 0 receives zero gradient (torch padding_idx contract)
    grads = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, g) ** 2))(params)
    g_emb = np.asarray(grads["label_embedding"]["embedding"])
    np.testing.assert_allclose(g_emb[0], 0.0, atol=0)
    assert np.abs(g_emb[1:]).max() > 0  # non-padding rows do train


def test_labels_change_output():
    g = _graph_with_labels()
    model = _model(use_label_embedding=True, num_classes=5, num_embedding=4)
    params = jax.jit(model.init)(jax.random.key(0), g)["params"]
    out = model.apply({"params": params}, g)
    g2 = dataclasses.replace(g, labels=(g.labels % 4) + 1)
    out2 = model.apply({"params": params}, g2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0


def test_flag_off_has_no_embedding_param():
    g = _graph_with_labels()
    model = _model()
    params = jax.jit(model.init)(jax.random.key(0), g)["params"]
    assert "label_embedding" not in params

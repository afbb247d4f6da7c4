"""Stacked batching (graph/build.py:build_stacked_graph + the
scan-over-scenes steps in trainers/graph_common.py): per-scene tables on a leading batch
axis, the layout multi-host data parallelism shards over hosts and the
fix for the concatenated-table gather cliff (BENCH_NOTES batched probe).

Covers: structural stacking + width freezing, exact-loss equivalence of
the stacked trainer vs the concatenated layout on the same batch
schedule, mesh sharding of the scene axis, and a REAL 2-process
jax.distributed run (CPU backend, Gloo) reproducing the single-process
trajectory over the same global batches."""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401

from test_train_e2e import make_3d_config, write_fake_scene
from stinet_tpu.data.scannet import (
    read_split, SCANNET_TRAIN_FILE, SCANNET_VAL_FILE)


@pytest.fixture
def scene_roots4(tmp_path, rng):
    train_root = str(tmp_path / "train")
    val_root = str(tmp_path / "val")
    for s in read_split(SCANNET_TRAIN_FILE)[:4]:
        write_fake_scene(train_root, s, rng)
    for s in read_split(SCANNET_VAL_FILE)[:2]:
        write_fake_scene(val_root, s, rng)
    return train_root, val_root


def test_build_stacked_graph_structure(rng):
    from stinet_tpu.utils.synthetic import synthetic_scene
    from stinet_tpu.graph.build import (
        build_stacked_graph, freeze_stacked_signature, table_widths)
    s1, s2 = synthetic_scene(900, seed=1), synthetic_scene(600, seed=2)
    g, w = build_stacked_graph([s1, s2], geometric=True)
    assert g.x.shape[0] == 2 and g.x.ndim == 3
    nv = np.asarray(g.levels[0].num_vertices)
    assert list(nv) == [900, 600]
    # both slices share the forced bucket; slot/edge widths unified
    assert g.levels[0].edges.nbr.shape[0] == 2
    # frozen signature admits both scenes and a margin
    vb, widths = freeze_stacked_signature([s1, s2], geometric=True)
    g2, w2 = build_stacked_graph([s1, s2], v_buckets=vb, widths=widths,
                                 geometric=True)
    for k, v in table_widths(jax.tree.map(lambda a: a[0], g2)).items():
        assert v == w2[k] or k[2] == "halo"
    # a scene exceeding the frozen signature fails loudly
    big = synthetic_scene(3000, seed=3)
    with pytest.raises((ValueError, AssertionError)):
        build_stacked_graph([big], v_buckets=vb, widths=widths,
                            geometric=True)


def test_stacked_trainer_matches_concatenated(tmp_path, scene_roots4):
    """Same scenes, same schedule: the stacked scanned step must produce
    the SAME loss as the concatenated layout (the loss combine is exact:
    sum of per-scene weighted sums over sum of normalizers) and track its
    SGD trajectory."""
    train_root, val_root = scene_roots4

    def run(stacked, tag):
        cfg_dict = make_3d_config(tmp_path / tag, train_root, val_root)
        cfg_dict["n_gpu"] = 1
        cfg_dict["data_loader"]["args"]["train_batch_size"] = 2
        cfg_dict["data_loader"]["args"]["test_batch_size"] = 2
        cfg_dict["data_loader"]["args"]["stacked_batching"] = stacked
        cfg_dict["trainer"]["epochs"] = 1
        cfg_dict["optimizer"] = {"type": "SGD",
                                 "args": {"lr": 1e-2, "momentum": 0.9}}
        cfg = ConfigParser(cfg_dict, dry_run=True)
        trainer = TRAINERS.get("Inpainting3DTrainer")(cfg)
        trainer.train()
        return trainer

    tc = run(False, "concat")
    ts = run(True, "stacked")
    assert ts._stacked and not tc._stacked
    lc = tc.train_metrics.avg("loss")
    ls = ts.train_metrics.avg("loss")
    assert np.isfinite(ls)
    np.testing.assert_allclose(ls, lc, rtol=1e-5)
    np.testing.assert_allclose(ts.valid_metrics.avg("loss"),
                               tc.valid_metrics.avg("loss"), rtol=1e-5)
    fc = jax.tree_util.tree_leaves(tc.state.params)
    fs = jax.tree_util.tree_leaves(ts.state.params)
    for a, b in zip(fc, fs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_stacked_dp_mesh(tmp_path, scene_roots4):
    """n_gpu=4 + stacked: the scene axis shards over the mesh's data axis
    and one epoch stays finite."""
    train_root, val_root = scene_roots4
    cfg_dict = make_3d_config(tmp_path, train_root, val_root)
    cfg_dict["n_gpu"] = 4
    cfg_dict["data_loader"]["args"]["train_batch_size"] = 4
    cfg_dict["data_loader"]["args"]["test_batch_size"] = 4
    cfg_dict["data_loader"]["args"]["stacked_batching"] = True
    cfg_dict["trainer"]["epochs"] = 1
    cfg = ConfigParser(cfg_dict, dry_run=True)
    trainer = TRAINERS.get("Inpainting3DTrainer")(cfg)
    assert trainer._mesh is not None
    g = trainer._example_graph()
    placed = trainer._place_graph(g)
    assert placed.x.sharding.num_devices == 4
    assert not placed.x.sharding.is_fully_replicated
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_driver(procs, port, local_devices, train_root, val_root,
                out_json, work_dir):
    env = dict(os.environ, PYTHONPATH="")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(os.path.dirname(__file__),
                          "_mp_stacked_driver.py")
    ps = [subprocess.Popen(
        [sys.executable, driver, str(i), str(procs), str(port),
         str(local_devices), train_root, val_root, out_json,
         f"{work_dir}_{i}"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(procs)]
    outs = []
    for p in ps:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(ps, outs):
        assert p.returncode == 0, f"driver failed:\n{out[-3000:]}"
        assert "DRIVER_OK" in out
    return outs


@pytest.mark.slow
def test_multiprocess_stacked_training_matches_single(tmp_path, rng):
    """THE multi-host test: 2 jax.distributed processes (2 CPU devices
    each, Gloo collectives) train the real Inpainting3DTrainer on a
    4-scene global batch schedule; the final params must match a
    single-process run (4 local devices) over the SAME global batches."""
    train_root = str(tmp_path / "train")
    val_root = str(tmp_path / "val")
    for s in read_split(SCANNET_TRAIN_FILE)[:4]:
        write_fake_scene(train_root, s, rng)
    for s in read_split(SCANNET_VAL_FILE)[:2]:
        write_fake_scene(val_root, s, rng)

    single = str(tmp_path / "single.json")
    multi = str(tmp_path / "multi.json")
    _run_driver(1, _free_port(), 4, train_root, val_root, single,
                str(tmp_path / "w1"))
    _run_driver(2, _free_port(), 2, train_root, val_root, multi,
                str(tmp_path / "w2"))

    r1 = json.load(open(single))
    r2 = json.load(open(multi))
    assert r1["devices"] == 4 and r2["devices"] == 4
    np.testing.assert_allclose(r2["train_loss"], r1["train_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(r2["val_loss"], r1["val_loss"], rtol=1e-5)
    p1 = np.load(single + ".params.npy")
    p2 = np.load(multi + ".params.npy")
    np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=1e-6)

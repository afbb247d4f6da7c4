"""Stacked batching for the SEGMENTATION trainer
(trainers/segmentation.py:make_stacked_segmentation_steps): the
scan-over-scenes multi-host layout extended to a BatchNorm model.

BN semantics under stacking (documented in the factory's docstring): each
scene normalizes with its own per-scene statistics, and the running-stats
EMA advances one order-independent step per optimizer step (across-scene
mean of per-scene updates). At batch_size=1 this coincides EXACTLY with
the concatenated layout (one scene per batch -> identical stats), which
gives the trajectory-equality anchor below; the 2-process test then locks
process-count invariance of the B=4 stacked trajectory."""
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

from test_train_e2e import make_seg_config, write_fake_label_scene
from stinet_tpu.data.scannet import (
    read_split, SCANNET_TRAIN_FILE, SCANNET_VAL_FILE)


@pytest.fixture
def label_roots4(tmp_path, rng):
    train_root = str(tmp_path / "train")
    val_root = str(tmp_path / "val")
    for s in read_split(SCANNET_TRAIN_FILE)[:4]:
        write_fake_label_scene(train_root, s, rng)
    for s in read_split(SCANNET_VAL_FILE)[:2]:
        write_fake_label_scene(val_root, s, rng)
    return train_root, val_root


def _make_cfg(tmp_path, train_root, val_root, stacked, batch=1, n_gpu=1):
    cfg_dict = make_seg_config(tmp_path, train_root, val_root)
    cfg_dict["n_gpu"] = n_gpu
    cfg_dict["data_loader"]["args"]["train_batch_size"] = batch
    cfg_dict["data_loader"]["args"]["test_batch_size"] = batch
    cfg_dict["data_loader"]["args"]["stacked_batching"] = stacked
    cfg_dict["trainer"]["epochs"] = 1
    cfg_dict["optimizer"] = {"type": "SGD",
                             "args": {"lr": 1e-2, "momentum": 0.9}}
    return ConfigParser(cfg_dict, dry_run=True)


def test_stacked_seg_matches_concat_bs1(tmp_path, label_roots4):
    """batch_size=1: per-scene BN stats == concatenated-batch BN stats, so
    the stacked trainer must reproduce the concatenated trajectory exactly
    (loss combine + grads + BN EMA)."""
    train_root, val_root = label_roots4

    def run(stacked, tag):
        cfg = _make_cfg(tmp_path / tag, train_root, val_root, stacked)
        trainer = TRAINERS.get("GraphSegmentationTrainer")(cfg)
        trainer.train()
        return trainer

    tc = run(False, "concat")
    ts = run(True, "stacked")
    assert ts._stacked and not tc._stacked
    np.testing.assert_allclose(ts.train_metrics.avg("loss"),
                               tc.train_metrics.avg("loss"), rtol=1e-5)
    np.testing.assert_allclose(ts.valid_metrics.avg("loss"),
                               tc.valid_metrics.avg("loss"), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(tc.state.params),
                    jax.tree_util.tree_leaves(ts.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tc.state.batch_stats),
                    jax.tree_util.tree_leaves(ts.state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_stacked_seg_dp_mesh(tmp_path, label_roots4):
    """n_gpu=4 + stacked batch of 4: scene axis shards over the data
    axis; one epoch trains finite with a finite IoU log."""
    train_root, val_root = label_roots4
    cfg = _make_cfg(tmp_path, train_root, val_root, True, batch=4, n_gpu=4)
    trainer = TRAINERS.get("GraphSegmentationTrainer")(cfg)
    assert trainer._mesh is not None and trainer._stacked
    g = trainer._example_graph()
    placed = trainer._place_graph(g)
    assert placed.x.sharding.num_devices == 4
    assert not placed.x.sharding.is_fully_replicated
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])
    assert np.isfinite(log["val_loss"])


def test_stacked_seg_val_tail_repeat_dedup(tmp_path, label_roots4):
    """2-scene val set at test_batch_size=4: the loader tail-repeats both
    scenes to fill the [4] signature; the validity weights must zero the
    repeats so val loss / IoU match a repeat-free test_batch_size=2 run
    bit-for-bit (same init seed, no training) — ADVICE r4."""
    train_root, val_root = label_roots4

    def val_log(tbs):
        cfg_dict = make_seg_config(tmp_path / f"tbs{tbs}", train_root,
                                   val_root)
        cfg_dict["data_loader"]["args"]["train_batch_size"] = 2
        cfg_dict["data_loader"]["args"]["test_batch_size"] = tbs
        cfg_dict["data_loader"]["args"]["stacked_batching"] = True
        cfg_dict["trainer"]["epochs"] = 1
        cfg_dict["optimizer"] = {"type": "SGD", "args": {"lr": 1e-2}}
        trainer = TRAINERS.get("GraphSegmentationTrainer")(
            ConfigParser(cfg_dict, dry_run=True))
        assert trainer._stacked
        return trainer._valid_epoch(1)

    log4 = val_log(4)   # 2 scenes + 2 tail repeats, weights (1,1,0,0)
    log2 = val_log(2)   # exact batch, no repeats
    np.testing.assert_allclose(log4["loss"], log2["loss"], rtol=1e-6)
    np.testing.assert_allclose(log4["mean_iou"], log2["mean_iou"],
                               rtol=1e-6)
    if "full_scene_mean_iou" in log2:
        np.testing.assert_allclose(log4["full_scene_mean_iou"],
                                   log2["full_scene_mean_iou"], rtol=1e-6)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_driver(procs, port, local_devices, train_root, val_root,
                out_json, work_dir):
    env = dict(os.environ, PYTHONPATH="")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(os.path.dirname(__file__), "_mp_seg_driver.py")
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
def test_multiprocess_stacked_seg_matches_single(tmp_path, rng):
    """2 jax.distributed processes (2 CPU devices each) train the real
    GraphSegmentationTrainer on a 4-scene global batch schedule; final
    params AND BatchNorm running stats must match a single-process run
    (4 local devices) over the SAME global batches."""
    train_root = str(tmp_path / "train")
    val_root = str(tmp_path / "val")
    for s in read_split(SCANNET_TRAIN_FILE)[:4]:
        write_fake_label_scene(train_root, s, rng)
    for s in read_split(SCANNET_VAL_FILE)[:2]:
        write_fake_label_scene(val_root, s, rng)

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

"""Tests: config parser CLI parity, TB writer, model IO + serving export,
LPIPS mechanics, visualization helpers, scannet label utils, profiling."""
import argparse
import collections
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stinet_tpu.core.config import ConfigParser


def minimal_config(tmp_path):
    return {"name": "t", "trainer": {"save_dir": str(tmp_path / "saved")},
            "optimizer": {"args": {"lr": 0.001}},
            "data_loader": {"args": {"batch_size": 4}}}


def test_config_from_args_overrides(tmp_path):
    cfg_path = tmp_path / "c.json"
    with open(cfg_path, "w") as f:
        json.dump(minimal_config(tmp_path), f)

    args = argparse.ArgumentParser()
    for flag, kw in (("-c", {}), ("-r", {}), ("-d", {}), ("-n", {}),
                     ("-m", {}), ("-g", {}), ("-e", {})):
        args.add_argument(flag, {"-c": "--config", "-r": "--resume",
                                 "-d": "--device", "-n": "--name",
                                 "-m": "--message", "-g": "--git_hash",
                                 "-e": "--eval"}[flag], default=None)
    args.add_argument("-t", "--dry_run", default=True)
    args.add_argument("-v", "--vis", default=False, action="store_true")
    CustomArgs = collections.namedtuple("CustomArgs", "flags type target")
    options = [CustomArgs(["--lr"], type=float,
                          target="optimizer;args;lr")]
    import sys
    argv = sys.argv
    sys.argv = ["prog", "-c", str(cfg_path), "-m", "msg", "--lr", "0.5"]
    try:
        cfg = ConfigParser.from_args(args, options)
    finally:
        sys.argv = argv
    assert cfg["optimizer"]["args"]["lr"] == 0.5  # key-path override applied
    assert cfg["description"] == "msg"
    assert cfg.dry_run


def test_config_writes_run_dirs(tmp_path):
    cfg = ConfigParser(minimal_config(tmp_path), dry_run=False)
    assert (cfg.save_dir / "config.json").exists()
    assert (cfg.log_dir / "config.json").exists()
    assert "models" in str(cfg.save_dir) and "log" in str(cfg.log_dir)


def test_writer_mode_tags(tmp_path):
    from stinet_tpu.core.writer import TensorboardWriter

    class FakeTB:
        def __init__(self):
            self.calls = []

        def add_scalar(self, tag, value, step):
            self.calls.append((tag, value, step))

    w = TensorboardWriter(tmp_path, enabled=False)
    w.writer = FakeTB()
    w.set_step(0, "train")
    w.add_scalar("loss", 1.0)
    w.set_step(5, "valid")
    w.add_scalar("loss", 2.0)
    tags = [c[0] for c in w.writer.calls]
    assert "loss/train" in tags and "loss/valid" in tags
    assert w.writer.calls[-1][2] == 5


def test_model_io_roundtrip(tmp_path):
    from stinet_tpu.core.checkpoint import save_checkpoint
    from stinet_tpu.utils.model_io import find_checkpoint, list_runs
    run = tmp_path / "saved" / "models" / "exp" / "0101_000000_run1"
    run.mkdir(parents=True)
    save_checkpoint(run / "checkpoint-epoch3.ckpt",
                    {"m": {"w": np.ones(3)}}, {"m": {}}, 3, 0.5, {})
    save_checkpoint(run / "checkpoint-epoch10.ckpt",
                    {"m": {"w": np.ones(3)}}, {"m": {}}, 10, 0.4, {})
    ckpt = find_checkpoint("exp", save_root=str(tmp_path / "saved"))
    assert ckpt.name == "checkpoint-epoch10.ckpt"
    assert len(list_runs("exp", str(tmp_path / "saved"))) == 1


def test_serving_export_roundtrip(tmp_path):
    from stinet_tpu.utils.model_io import export_serving, load_serving

    def fn(x, w):
        return jnp.tanh(x @ w)

    x = jnp.ones((4, 8))
    w = jnp.ones((8, 2)) * 0.1
    path = export_serving(fn, (x, w), str(tmp_path / "model.stablehlo"))
    loaded = load_serving(path)
    np.testing.assert_allclose(np.asarray(loaded(x, w)),
                               np.asarray(fn(x, w)), rtol=1e-6)


def test_lpips_mechanics(rng):
    from stinet_tpu.metrics.lpips import random_lpips
    lp = random_lpips(img_size=32)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    d_same = np.asarray(lp(x, x))
    assert np.allclose(d_same, 0.0, atol=1e-6)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    assert (np.asarray(lp(x, y)) > 0).all()


def test_image_grid_and_labels():
    from stinet_tpu.utils.visualization_utils import (
        make_image_grid, colorize_labels)
    imgs = np.random.rand(5, 8, 8, 3).astype(np.float32)
    grid = make_image_grid(imgs, nrow=3, pad=1)
    assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 3)
    colors = colorize_labels([0, 1], {0: (0, 0, 0), 1: (255, 0, 0)})
    np.testing.assert_allclose(colors[1], [1.0, 0.0, 0.0])


def test_scannet_label_remap():
    from stinet_tpu.utils.scannet_utils import remap_labels, VALID_CLASS_IDS
    raw = np.array([0, 1, 12, 14, 39, 40, 13, -5, 100])
    out = remap_labels(raw)
    assert out[0] == 0 and out[1] == 1 and out[2] == 12
    assert out[3] == 13      # nyu 14 -> class 13
    assert out[4] == 20      # nyu 39 -> class 20
    assert out[5] == 0 and out[6] == 0  # unmapped ids -> ignored
    assert out[7] == 0 and out[8] == 0  # corrupted ids clamped


def test_synced_timer():
    from stinet_tpu.utils.profiling import SyncedTimer
    t = SyncedTimer(warmup=1)
    for _ in range(3):
        with t.section("work"):
            sum(range(1000))
    res = t.results()
    assert "work" in res and res["work"] >= 0.0

def test_amsgrad_matches_torch(rng):
    """build_optimizer's Adam(amsgrad) follows torch.optim.Adam exactly."""
    import torch
    import optax
    from stinet_tpu.trainers.graph_common import build_optimizer
    w0 = rng.normal(size=(5, 4)).astype(np.float32)
    grads = [rng.normal(size=(5, 4)).astype(np.float32) for _ in range(20)]
    lr = 1e-3
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, amsgrad=True)
    for g in grads:
        wt.grad = torch.from_numpy(g)
        opt.step()
    tx, _ = build_optimizer({"type": "Adam",
                             "args": {"lr": lr, "amsgrad": True}})
    wj = jnp.asarray(w0)
    st = tx.init(wj)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, wj)
        wj = wj + upd * lr
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

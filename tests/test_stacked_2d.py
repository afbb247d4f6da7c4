"""Stacked batching for the 2D inpainting trainer
(trainers/inpainting2d.py:_make_stacked_graph_steps / _make_stacked_2d_steps):
the multi-host layout (VERDICT r3 item 4).

Equal-size samples make the combines EXACT: the graph branch's scanned
per-sample means average to the concatenated batch mean (same pixel count
per sample), and the 2d branch computes the same global means over dense
images. Both branches must reproduce the concatenated trajectory."""
import jax
import numpy as np
import pytest

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401


def make_2d_config(tmp_path, branch, batch=2, epochs=2, stacked=False,
                   n_gpu=1, use_gan=False):
    graph = branch == "graph"
    return {
        "name": "test2d", "n_gpu": n_gpu, "seed": 7,
        "archs": {
            "SurfaceTextureInpaintingNet": {"enabled": graph, "args": {
                "input_nc": 4, "output_nc": 3, "ngf": 8, "n_blocks": 2,
                "dilations": [1, 1], "norm": "instance",
                "pooling_type": "mean", "n_levels": 2,
                "n_repeated_io_convs": 1, "filter_type": "edgeconv"}},
            "Resnet2D": {"enabled": not graph, "args": {
                "input_nc": 4, "output_nc": 3, "ngf": 8, "n_blocks": 2,
                "norm": "instance", "filter_type": "conv2d",
                "use_dropout": False}}},
        "data_loader": {"type": "ImageGraphTextureDataLoader", "args": {
            "root_dir": "", "img_size": 32, "end_level": 3,
            "crop_half_width": 8, "circle_radius": 4, "num_circles": 2,
            "random_mask": False, "random_augmentation": False,
            "max_items": 8, "train_batch_size": batch,
            "test_batch_size": batch, "num_workers": 0,
            "num_static_samples": 2, "stacked_batching": stacked}},
        "lr_scheduler": {"type": "StepLR",
                         "args": {"step_size": 100, "gamma": 0.5}},
        "optimizer": {"type": "SGD", "args": {"lr": 1e-2, "momentum": 0.9}},
        "loss": "", "metrics": [],
        "trainer": {"type": "Inpainting2DTrainer", "epochs": epochs,
                    "save_dir": str(tmp_path / "saved"),
                    "do_validation": True, "batches_per_log": 100,
                    "save_period": 1, "verbosity": 0,
                    "monitor": "min val_loss", "early_stop": 10,
                    "tensorboard": False, "use_gan": use_gan,
                    "use_total_variation": False,
                    "visualize_samples": False},
        "eval": None, "vis": False, "git_hash": "test",
    }


def _run(tmp_path, branch, stacked, tag, **kw):
    cfg = ConfigParser(make_2d_config(tmp_path / tag, branch,
                                      stacked=stacked, **kw), dry_run=True)
    trainer = TRAINERS.get("Inpainting2DTrainer")(cfg)
    trainer.train()
    return trainer


def _assert_same_trajectory(tc, ts, rtol=1e-4):
    np.testing.assert_allclose(ts.train_metrics.avg("loss"),
                               tc.train_metrics.avg("loss"), rtol=1e-5)
    np.testing.assert_allclose(ts.valid_metrics.avg("loss"),
                               tc.valid_metrics.avg("loss"), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(tc.state.params),
                    jax.tree_util.tree_leaves(ts.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=1e-6)


@pytest.mark.parametrize("branch", ["graph", "2d"])
def test_stacked_2d_matches_concatenated(tmp_path, branch):
    tc = _run(tmp_path, branch, False, "concat")
    ts = _run(tmp_path, branch, True, "stacked")
    assert ts._stacked and not tc._stacked
    _assert_same_trajectory(tc, ts)


def test_stacked_2d_gan_matches_concatenated(tmp_path):
    tc = _run(tmp_path, "2d", False, "concat", use_gan=True, epochs=1)
    ts = _run(tmp_path, "2d", True, "stacked", use_gan=True, epochs=1)
    _assert_same_trajectory(tc, ts)
    for a, b in zip(jax.tree_util.tree_leaves(tc.disc_state.params),
                    jax.tree_util.tree_leaves(ts.disc_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_driver(procs, port, local_devices, branch, use_gan, out_json,
                work_dir):
    import os
    import subprocess
    import sys
    env = dict(os.environ, PYTHONPATH="")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(os.path.dirname(__file__), "_mp_2d_driver.py")
    ps = [subprocess.Popen(
        [sys.executable, driver, str(i), str(procs), str(port),
         str(local_devices), branch, "1" if use_gan else "0", out_json,
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
@pytest.mark.parametrize("branch,use_gan", [("graph", False), ("2d", True)])
def test_multiprocess_stacked_2d_matches_single(tmp_path, branch, use_gan):
    """2 jax.distributed processes (2 CPU devices each) train the real
    Inpainting2DTrainer on a 4-sample global batch schedule; final
    generator params (and discriminator params on the GAN branch) must
    match a single-process run (4 local devices) over the SAME global
    batches. This is the 2D analog of
    test_stacked_seg.py::test_multiprocess_stacked_seg_matches_single
    (VERDICT r4 item 4) — the reference asserts single-GPU here
    (/root/reference/trainers/inpainting2d_trainer.py:42)."""
    import json
    single = str(tmp_path / "single.json")
    multi = str(tmp_path / "multi.json")
    _run_driver(1, _free_port(), 4, branch, use_gan, single,
                str(tmp_path / "w1"))
    _run_driver(2, _free_port(), 2, branch, use_gan, multi,
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


def test_stacked_2d_dp_mesh(tmp_path):
    trainer = _run(tmp_path, "graph", True, "mesh", batch=4, n_gpu=4,
                   epochs=1)
    assert trainer._mesh is not None
    g = trainer._example_graph()
    placed = trainer._prep(g)
    assert placed.x.sharding.num_devices == 4
    assert not placed.x.sharding.is_fully_replicated
    assert np.isfinite(trainer.train_metrics.avg("loss"))

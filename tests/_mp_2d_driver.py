"""Subprocess driver for the multi-process stacked 2D-INPAINTING test
(test_stacked_2d.py::test_multiprocess_stacked_2d_matches_single). Runs the
REAL Inpainting2DTrainer under jax.distributed on the CPU backend:
argv = [proc, nprocs, port, local_devices, branch, use_gan, out_json,
work_dir]. nprocs=1 skips distributed init — the single-process baseline
over the same GLOBAL batch schedule, whose trajectory (generator params,
and discriminator params when use_gan) the 2-process run must reproduce.
The hermetic ImageGraphTextureDataLoader fabricates its textures
in-process, so no data directories are needed (unlike _mp_seg_driver.py).
"""
import json
import os
import sys

proc, nprocs = int(sys.argv[1]), int(sys.argv[2])
port, local_devices = sys.argv[3], sys.argv[4]
branch, use_gan = sys.argv[5], sys.argv[6] == "1"
out_json, work_dir = sys.argv[7:9]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}")
os.environ["STINET_DISABLE_GIT_TAG"] = "1"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.distributed.initialize(f"localhost:{port}", nprocs, proc)

import numpy as np  # noqa: E402
from stinet_tpu.core.config import ConfigParser  # noqa: E402
from stinet_tpu.core.registry import TRAINERS  # noqa: E402
import stinet_tpu.trainers  # noqa: E402,F401
import stinet_tpu.data  # noqa: E402,F401
from test_stacked_2d import make_2d_config  # noqa: E402

cfg_dict = make_2d_config(__import__("pathlib").Path(work_dir), branch,
                          batch=4, epochs=1 if use_gan else 2,
                          stacked=True, n_gpu=4, use_gan=use_gan)
cfg = ConfigParser(cfg_dict, dry_run=True)
trainer = TRAINERS.get("Inpainting2DTrainer")(cfg)
assert trainer._stacked
trainer.train()

leaves = jax.tree_util.tree_leaves(trainer.state.params)
if use_gan:
    leaves += jax.tree_util.tree_leaves(trainer.disc_state.params)
flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
result = {
    "proc": proc, "nprocs": nprocs,
    "devices": jax.device_count(),
    "train_loss": float(trainer.train_metrics.avg("loss")),
    "val_loss": float(trainer.valid_metrics.avg("loss")),
    "params_l2": float(np.linalg.norm(flat)),
}
if proc == 0:
    np.save(out_json + ".params.npy", flat)
    with open(out_json, "w") as f:
        json.dump(result, f)
print("DRIVER_OK", json.dumps(result), flush=True)

"""Subprocess driver for the multi-process stacked SEGMENTATION test
(test_stacked_seg.py). Runs the REAL GraphSegmentationTrainer under
jax.distributed on the CPU backend: argv = [proc, nprocs, port,
local_devices, train_root, val_root, out_json, work_dir]. nprocs=1 skips
distributed init — the single-process baseline over the same GLOBAL batch
schedule, whose trajectory (params AND BatchNorm running stats) the
2-process run must reproduce."""
import json
import os
import sys

proc, nprocs = int(sys.argv[1]), int(sys.argv[2])
port, local_devices = sys.argv[3], sys.argv[4]
train_root, val_root, out_json, work_dir = sys.argv[5:9]

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
from test_train_e2e import make_seg_config  # noqa: E402

cfg_dict = make_seg_config(__import__("pathlib").Path(work_dir),
                           train_root, val_root)
cfg_dict["n_gpu"] = 4  # 4 global devices in both configurations
cfg_dict["data_loader"]["args"]["train_batch_size"] = 4
# global val batch must also shard over the data=4 mesh; the 2-scene val
# set tail-repeats up to 4 (data/scannet.py:_SceneLoader._produce)
cfg_dict["data_loader"]["args"]["test_batch_size"] = 4
cfg_dict["data_loader"]["args"]["stacked_batching"] = True
cfg_dict["trainer"]["epochs"] = 2
cfg_dict["optimizer"] = {"type": "SGD", "args": {"lr": 1e-2,
                                                 "momentum": 0.9}}
cfg = ConfigParser(cfg_dict, dry_run=True)
trainer = TRAINERS.get("GraphSegmentationTrainer")(cfg)
assert trainer._stacked
trainer.train()

# params AND BatchNorm running stats: the stats EMA is where a sharding-
# dependent aggregation would first diverge
leaves = (jax.tree_util.tree_leaves(trainer.state.params)
          + jax.tree_util.tree_leaves(trainer.state.batch_stats))
flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
result = {
    "proc": proc, "nprocs": nprocs,
    "devices": jax.device_count(),
    "train_loss": float(trainer.train_metrics.avg("loss")),
    "val_loss": float(trainer.valid_metrics.avg("loss")),
    "params_l2": float(np.linalg.norm(flat)),
    "params_sum": float(flat.sum()),
}
if proc == 0:
    np.save(out_json + ".params.npy", flat)
    with open(out_json, "w") as f:
        json.dump(result, f)
print("DRIVER_OK", json.dumps(result), flush=True)

"""3D training with train_batch_size > 1: two different-size scenes batched
into one block-diagonal graph, per-graph norms via segments, geometric
bucketing."""
import numpy as np

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401

from tests.test_train_e2e import make_3d_config, write_fake_scene


def test_3d_batched_training(tmp_path, rng):
    from stinet_tpu.data.scannet import (
        read_split, SCANNET_TRAIN_FILE, SCANNET_VAL_FILE)
    train_root, val_root = str(tmp_path / "train"), str(tmp_path / "val")
    scenes = read_split(SCANNET_TRAIN_FILE)[:4]
    for i, s in enumerate(scenes):
        write_fake_scene(train_root, s, rng, v0=100 + 30 * i)
    for s in read_split(SCANNET_VAL_FILE)[:1]:
        write_fake_scene(val_root, s, rng)

    config = make_3d_config(tmp_path, train_root, val_root)
    config["data_loader"]["args"]["train_batch_size"] = 2
    config["data_loader"]["args"]["num_cumulated_train_batches"] = 1
    config["trainer"]["epochs"] = 1
    cfg = ConfigParser(config, dry_run=True)
    trainer = TRAINERS.get("Inpainting3DTrainer")(cfg)
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])
    assert np.isfinite(log["val_psnr"])

    # batches really contain two graphs
    for g, names in trainer.data_loader.train_loader:
        assert g.num_graphs == 2 and len(names) == 2
        gid = np.asarray(g.levels[0].graph_id)
        assert set(np.unique(gid)) == {0, 1, 2}  # two graphs + pad id
        break
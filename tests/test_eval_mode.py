"""Eval-mode CLI path: train briefly, then `--eval valid --resume <ckpt>`
through the trainer.eval() entry (reference eval_3d_inpainting.sh flow)."""
import numpy as np

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401

from tests.test_train_e2e import (
    make_3d_config, write_fake_scene)


def test_eval_mode_with_resume(tmp_path, rng):
    from stinet_tpu.data.scannet import (
        read_split, SCANNET_TRAIN_FILE, SCANNET_VAL_FILE)
    train_root, val_root = str(tmp_path / "train"), str(tmp_path / "val")
    for s in read_split(SCANNET_TRAIN_FILE)[:1]:
        write_fake_scene(train_root, s, rng)
    for s in read_split(SCANNET_VAL_FILE)[:1]:
        write_fake_scene(val_root, s, rng)

    config = make_3d_config(tmp_path, train_root, val_root)
    config["trainer"]["epochs"] = 1
    cfg = ConfigParser(config, dry_run=False)
    trainer = TRAINERS.get("Inpainting3DTrainer")(cfg)
    trainer.train()
    ckpt = cfg.save_dir / "model_best.ckpt"
    assert ckpt.exists()

    # eval-mode run resuming the checkpoint (vis off: headless PLY dump is
    # covered by utils tests)
    config2 = make_3d_config(tmp_path, train_root, val_root)
    config2["vis"] = False
    cfg2 = ConfigParser(config2, resume=ckpt, dry_run=True)
    trainer2 = TRAINERS.get("Inpainting3DTrainer")(cfg2)
    trainer2.eval("valid")
    assert np.isfinite(trainer2.valid_metrics.avg("psnr"))
    assert trainer2.valid_metrics.avg("psnr") > 0
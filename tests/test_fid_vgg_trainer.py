"""2D trainer with FID + VGG enabled (random feature weights — exercises the
full plumbing: VGG loss inside the jitted step, FID sessions per epoch)."""
import numpy as np

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401

from tests.test_train_e2e import make_2d_config


def test_2d_trainer_with_vgg_and_fid(tmp_path):
    config = make_2d_config(tmp_path)
    config["trainer"].update({
        "use_vgg": True,
        "use_total_variation": True,
        "vgg_content_weight": 0.03,
        "vgg_style_weight": 1.0,
        "total_variation_weight": 1e-4,
        "use_val_fid": True,
        "use_train_fid": True,
        "epochs_per_fid": 1,
        "vgg_resize": 32,
        "epochs": 1,
    })
    cfg = ConfigParser(config, dry_run=True)
    trainer = TRAINERS.get("Inpainting2DTrainer")(cfg)
    assert trainer.vgg_loss is not None
    assert trainer._fid is not None
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])
    assert "val_fid" in log or "fid" in {k.replace("val_", "")
                                         for k in log}
    fid_val = log.get("val_fid", log.get("fid"))
    assert np.isfinite(fid_val)
    assert np.isfinite(log["train_fid"])
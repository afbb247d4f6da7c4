"""2D trainer with FID + VGG + LPIPS enabled (random feature weights behind
the explicit allow_random_features opt-in — exercises the full plumbing: VGG
loss inside the jitted step, FID sessions per epoch, per-batch lpips metric,
and the fail-closed gate when the opt-in is missing)."""
import numpy as np
import pytest

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401

from tests.test_train_e2e import make_2d_config


def test_2d_trainer_with_vgg_fid_lpips(tmp_path):
    config = make_2d_config(tmp_path)
    # lpips(alex) needs >= 32px inputs (stride-4 trunk)
    config["data_loader"]["args"]["img_size"] = 32
    config["data_loader"]["args"]["circle_radius"] = 6
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
        "use_lpips": True,
        "allow_random_features": True,
        "epochs": 1,
    })
    cfg = ConfigParser(config, dry_run=True)
    trainer = TRAINERS.get("Inpainting2DTrainer")(cfg)
    assert trainer.vgg_loss is not None
    assert trainer._fid is not None
    assert trainer.lpips is not None
    # random-feature runs are tagged so they can't be mistaken for real FID
    assert trainer._fid_tag == "fid_random_features"
    assert trainer.lpips_tag == "lpips_random_features"
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])
    fid_keys = [k for k in log if "fid_random_features" in k]
    assert fid_keys, log.keys()
    for k in fid_keys:
        assert np.isfinite(log[k])
    assert not any(k in ("fid", "val_fid", "train_fid") for k in log)
    # lpips tracked per batch in both train and val logs (reference
    # inpainting2d_trainer.py:158-167)
    assert np.isfinite(log["lpips_random_features"])
    assert np.isfinite(log["val_lpips_random_features"])


@pytest.mark.parametrize("flag", ["use_vgg", "use_lpips", "fid"])
def test_random_features_fail_closed(tmp_path, flag):
    """Without converted weights AND without allow_random_features, enabling
    a perceptual net must error out instead of silently training against
    random features (VERDICT r1 item 6)."""
    config = make_2d_config(tmp_path)
    if flag == "fid":
        config["trainer"].update({"use_val_fid": True, "epochs_per_fid": 1})
    else:
        config["trainer"][flag] = True
    cfg = ConfigParser(config, dry_run=True)
    with pytest.raises(ValueError, match="allow_random_features"):
        TRAINERS.get("Inpainting2DTrainer")(cfg)

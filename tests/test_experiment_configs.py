"""The shipped experiment configs stay schema-valid: they parse, their types
resolve in the registries, and their arch args construct models."""
import json
import glob

import pytest

from stinet_tpu.core.registry import TRAINERS, DATALOADERS
import stinet_tpu.trainers  # noqa: F401
import stinet_tpu.data  # noqa: F401
from stinet_tpu.models.factory import define_G


@pytest.mark.parametrize("path", sorted(glob.glob(
    "experiments/*/config/*.json")))
def test_config_schema(path):
    with open(path) as f:
        config = json.load(f)
    assert config["trainer"]["type"] in TRAINERS
    assert config["data_loader"]["type"] in DATALOADERS
    for arch, spec in config["archs"].items():
        if arch == "SingleConvMeshNet":
            from stinet_tpu.models.singleconvmeshnet import SingleConvMeshNet
            SingleConvMeshNet(**spec["args"])
        else:
            define_G(**spec["args"])
    assert "optimizer" in config and "lr_scheduler" in config
    assert config["trainer"]["monitor"].split()[0] in ("min", "max")

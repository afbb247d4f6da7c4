"""CLI entry — flag/config surface parity with the reference train.py
(/root/reference/train.py:54-80): -c/-r/-d/-t/-n/-m/-g/-e/-v plus --lr/--bs
key-path overrides, seeded runs, trainer dispatch by config type."""
import argparse
import collections
import subprocess

import numpy as np

from stinet_tpu.core.config import ConfigParser
from stinet_tpu.core.registry import TRAINERS
import stinet_tpu.trainers  # noqa: F401  (registers trainer types)

DEFAULT_SEED = 123


def main(config):
    # Multi-host entry: no-op single-process; on a managed multi-process
    # launch (TPU pod) initializes jax.distributed before any device use.
    from stinet_tpu.parallel import multihost
    multihost.initialize()

    logger = config.get_logger("train")

    seed = config.get("seed") if config.get("seed") is not None \
        else DEFAULT_SEED
    logger.info("Random seed: %s", seed)

    git_hash = config.get("git_hash")
    if git_hash is None:
        try:
            git_hash = subprocess.check_output(
                ["git", "describe", "--always"]).strip().decode()
        except Exception:
            git_hash = "unknown"
    logger.info("Git hash: %s", git_hash)
    logger.info("Description: %s", config.get("description", ""))

    np.random.seed(seed)

    trainer_cls = TRAINERS.get(config["trainer"]["type"])
    trainer = trainer_cls(config)
    if config["eval"]:
        trainer.eval(config["eval"])
    else:
        trainer.train()


if __name__ == "__main__":
    args = argparse.ArgumentParser(description="stinet_tpu")
    args.add_argument("-c", "--config", default=None, type=str,
                      help="config file path (default: None)")
    args.add_argument("-r", "--resume", default=None, type=str,
                      help="path to latest checkpoint (default: None)")
    args.add_argument("-d", "--device", default=None, type=str,
                      help="devices to enable (default: all)")
    args.add_argument("-t", "--dry_run", default=False, type=bool,
                      help="disable logging of models to disk")
    args.add_argument("-n", "--name", default=None, type=str,
                      help="name of this training session")
    args.add_argument("-m", "--message", default=None, type=str,
                      help="description of this training session")
    args.add_argument("-g", "--git_hash", default=None, type=str,
                      help="manually enter git hash")
    args.add_argument("-e", "--eval", default=None, type=str,
                      help='evaluate on the "train", "valid" or "test" sets')
    args.add_argument("-v", "--vis", default=False, action="store_true",
                      help="visualize evaluation")

    CustomArgs = collections.namedtuple("CustomArgs", "flags type target")
    options = [
        CustomArgs(["--lr", "--learning_rate"], type=float,
                   target="optimizer;args;lr"),
        CustomArgs(["--bs", "--batch_size"], type=int,
                   target="data_loader;args;batch_size"),
        CustomArgs(["--ld", "--log_dir"], type=str,
                   target="trainer;save_dir"),
    ]
    main(ConfigParser.from_args(args, options))

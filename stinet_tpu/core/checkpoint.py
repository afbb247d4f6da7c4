"""Checkpoint/resume with the reference's semantics
(/root/reference/trainers/inpainting3d_trainer.py:315-369, base_trainer.py:
139-201): periodic `checkpoint-epoch{N}` files plus `model_best` on monitored
improvement, storing named model params, named optimizer states, epoch,
monitor_best, and the resolved config. Serialized with flax msgpack +
a JSON sidecar with the metadata (config, archs, epoch)."""
import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _to_pure(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path, models, opt_states, epoch, monitor_best, config,
                    archs=None, extra=None):
    """models / opt_states: dicts name -> pytree."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = {
        "state_dicts": _to_pure(models),
        "optimizers": _to_pure(opt_states),
        "extra": _to_pure(extra or {}),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = {
        "archs": archs or {name: name for name in models},
        "epoch": int(epoch),
        "monitor_best": float(monitor_best),
        "config": config,
    }
    with open(str(path) + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path, models_template, opt_states_template,
                    extra_template=None):
    """Restore into the given templates (fresh-initialized pytrees).
    Returns (models, opt_states, extra, meta)."""
    path = Path(path)
    target = {
        "state_dicts": models_template,
        "optimizers": opt_states_template,
        "extra": extra_template or {},
    }
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    with open(str(path) + ".meta.json") as f:
        meta = json.load(f)
    return state["state_dicts"], state["optimizers"], state["extra"], meta


def latest_checkpoint(run_dir):
    """Newest checkpoint in a run dir: model_best if present else highest
    epoch (reference utils/model_io_utils.py:75-84 fallback behavior)."""
    run_dir = Path(run_dir)
    best = run_dir / "model_best.ckpt"
    if best.exists():
        return best
    cands = sorted(run_dir.glob("checkpoint-epoch*.ckpt"),
                   key=lambda p: int("".join(filter(str.isdigit, p.stem))))
    return cands[-1] if cands else None


def load_model_params(path, name, params_template):
    """Restore one model's params from a checkpoint WITHOUT optimizer
    templates (serving / standalone eval). The full-state loader
    (load_checkpoint) needs matching opt-state pytrees; here we msgpack-
    decode the raw tree and lift just state_dicts[name] onto the given
    params template."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(
        params_template, raw["state_dicts"][name])

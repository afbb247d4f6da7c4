"""Trained-model IO — parity with /root/reference/utils/model_io_utils.py:
browse runs under saved/models/<experiment>/, load a model by experiment +
run id with best-or-newest checkpoint fallback, and export for serving.

The serving export is the TPU-native analog of the reference's TorchScript
export (model_io_utils.py:88-133): `jax.export` serializes the jitted
forward (StableHLO) so it can be loaded and executed without Python model
code."""
from pathlib import Path

from stinet_tpu.core.checkpoint import latest_checkpoint


def list_runs(experiment_name: str, save_root: str = "saved"):
    base = Path(save_root) / "models" / experiment_name
    return sorted(p for p in base.glob("*") if p.is_dir())


def find_checkpoint(experiment_name: str, run_id: str = None,
                    save_root: str = "saved"):
    """Newest run when run_id is None; model_best else highest epoch
    (reference model_io_utils.py:57-84)."""
    runs = list_runs(experiment_name, save_root)
    if not runs:
        raise FileNotFoundError(
            f"no runs for experiment {experiment_name!r} under {save_root}")
    if run_id is not None:
        matches = [r for r in runs if run_id in r.name]
        if not matches:
            raise FileNotFoundError(f"no run matching {run_id!r}")
        run = matches[-1]
    else:
        run = runs[-1]
    ckpt = latest_checkpoint(run)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoints in {run}")
    return ckpt


def export_serving(fn, example_args, out_path: str):
    """AOT-export a jitted callable to serialized StableHLO. Load with
    `load_serving` and call without any model/python code."""
    import jax
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_serving(path: str):
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call

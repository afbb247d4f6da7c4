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
    `load_serving` and call without any model/python code.

    The export's calling convention is the FLATTENED leaf list of
    `example_args` (jax.export cannot serialize our graph dataclasses'
    pytree structure — int-keyed dilation dicts are unsupported), so the
    loaded callable flattens its arguments the same way; pass structures
    congruent with `example_args`."""
    import jax
    from jax import export as jexport

    leaves, treedef = jax.tree.flatten(example_args)

    def fn_flat(*leaf_args):
        return fn(*jax.tree.unflatten(treedef, leaf_args))

    exported = jexport.export(jax.jit(fn_flat))(*leaves)
    data = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_serving(path: str):
    """Returns a callable taking the same (structured) arguments as the
    exported fn; they are flattened to the export's leaf convention."""
    import jax
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(*args):
        return exported.call(*jax.tree.leaves(args))

    return call

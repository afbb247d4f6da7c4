"""Multi-host (multi-process) training support.

The reference is a single-process, single-GPU program (SURVEY.md §2.7;
single-GPU asserts at /root/reference/trainers/inpainting3d_trainer.py:25,
inpainting2d_trainer.py:42, and no communication backend anywhere). On TPU
pods JAX runs one process per host, each seeing only its local chips; this
module is the framework's entry for that regime:

  * :func:`initialize` — idempotent `jax.distributed.initialize` wrapper
    (TPU pods auto-detect coordinator/process-id from the environment);
  * :func:`make_global_mesh` — mesh over ALL global devices, laid out with
    `mesh_utils.create_device_mesh` so the data/model axes map onto the ICI
    torus instead of raw enumeration order (collectives ride ICI, not DCN);
  * :func:`local_scene_shard` — deterministic per-host slice of a scene
    list so each host's loader reads a disjoint shard;
  * :func:`global_graph_from_local` — assemble each host's locally-built
    padded graph batch into global `jax.Array`s
    (`make_array_from_process_local_data`) sharded over the mesh's data
    axis, so the same jitted GSPMD train step serves one host or many;
  * :func:`is_primary` — process-0 gating for checkpoints / TensorBoard /
    run-dir side effects (every host computes, one host writes).

Single-process behavior is exactly the status quo: every helper degrades to
the identity / local path, so the trainers call these unconditionally.
"""
import logging
import os

import jax
import numpy as np

_log = logging.getLogger(__name__)

# Env vars that signal a managed multi-process launch where
# jax.distributed.initialize() can auto-detect its arguments.
_AUTODETECT_ENV = (
    "COORDINATOR_ADDRESS",          # explicit JAX coordinator
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multislice TPU
)


def _multi_worker_env():
    """GCE TPU pod metadata: only a COMMA-SEPARATED worker list means a
    multi-host launch. Single-host stacks (including this image's axon
    tunnel sitecustomize) set TPU_WORKER_HOSTNAMES to one hostname, where
    distributed init is pointless and can hang dialing a coordinator."""
    return "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")

_initialized = False


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None):
    """Idempotent multi-process init. With explicit args, always calls
    `jax.distributed.initialize`. With no args, calls it only when the
    environment looks like a managed multi-host launch (TPU pod metadata /
    coordinator env vars) — a plain single-process run stays untouched, so
    `train.py` can call this unconditionally before touching any device.
    """
    global _initialized
    if _initialized:
        return False
    explicit = coordinator_address or num_processes or process_id is not None
    if not explicit and not any(os.environ.get(k) for k in _AUTODETECT_ENV) \
            and not _multi_worker_env():
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    _log.info("jax.distributed initialized: process %d / %d, %d local / %d "
              "global devices", jax.process_index(), jax.process_count(),
              jax.local_device_count(), jax.device_count())
    return True


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def is_primary():
    """True on the process that should perform filesystem / logging side
    effects (checkpoints, TensorBoard, run dirs). Always True
    single-process."""
    return jax.process_index() == 0


def make_global_mesh(model_parallel=1, axis_names=("data", "model")):
    """Mesh over ALL global devices (every process must call this with the
    same arguments). Uses `mesh_utils.create_device_mesh`, which permutes
    devices so that neighboring mesh coordinates are ICI neighbors on TPU
    tori — `parallel/mesh.py:make_mesh`'s raw `jax.devices()` reshape is
    only topology-correct single-host. Falls back to that reshape if the
    topology library rejects the shape (e.g. virtual CPU devices)."""
    from jax.sharding import Mesh
    n = jax.device_count()
    assert n % model_parallel == 0, \
        f"{n} devices not divisible by model_parallel={model_parallel}"
    shape = (n // model_parallel, model_parallel)
    try:
        from jax.experimental import mesh_utils
        devices = mesh_utils.create_device_mesh(shape)
    except Exception as e:  # noqa: BLE001 — topology lib is best-effort
        _log.debug("create_device_mesh(%s) failed (%s); falling back to "
                   "enumeration order", shape, e)
        devices = np.asarray(jax.devices()).reshape(shape)
    return Mesh(devices, axis_names)


def local_scene_shard(items, index=None, count=None):
    """Deterministic per-host shard of a scene/sample list: host i takes
    items[i::count] (round-robin keeps per-host counts within 1 of each
    other for any list length). Identity when single-process. Every host
    must pass the same `items` ordering — callers shard AFTER the seeded
    shuffle so epochs stay globally consistent."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if count <= 1:
        return list(items)
    return list(items)[index::count]


def global_graph_from_local(mesh, local_graph, sharding_fn=None):
    """Assemble per-host padded graph batches into global arrays on `mesh`.

    Each host builds its OWN local batch (its shard of scenes through the
    normal loader/padding path, all hosts using the same bucket sizes so
    global shapes agree); this stitches the host-local leaves into global
    `jax.Array`s whose data axis spans all hosts. Single-process this is
    exactly `place_graph_on_mesh` (a device_put). `sharding_fn` defaults to
    `parallel.mesh.graph_sharding` (vertex/edge dims over "data",
    scalars replicated)."""
    from stinet_tpu.parallel.mesh import graph_sharding
    shardings = (sharding_fn or graph_sharding)(local_graph, mesh)
    if jax.process_count() <= 1:
        return jax.device_put(local_graph, shardings)

    def assemble(leaf, sharding):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(leaf))

    return jax.tree.map(assemble, local_graph, shardings)


def mean_scalar_metrics(log):
    """Average every numeric value of an epoch-log dict across hosts so
    monitoring decisions (best-checkpoint, early stopping, LR plateau) are
    globally consistent — each host computes metrics on its own data shard.
    Identity single-process; non-numeric entries pass through local."""
    if jax.process_count() <= 1:
        return log
    keys = sorted(k for k, v in log.items()
                  if isinstance(v, (int, float, np.floating, np.integer))
                  and not isinstance(v, bool))
    if not keys:
        return log
    from jax.experimental import multihost_utils
    vals = np.asarray([float(log[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(vals)  # [P, K]
    out = dict(log)
    for k, v in zip(keys, np.mean(gathered, axis=0)):
        out[k] = float(v)
    return out


def sync_hosts(name="barrier"):
    """Cross-host barrier (no-op single-process). Used around checkpoint
    writes so non-primary hosts don't race ahead into the next epoch's
    side effects while process 0 is still serializing."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)

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
    """Place a CONCATENATED batch graph on `mesh` (vertex/edge dims over
    "data", scalars replicated) — single-process only. A concatenated
    graph cannot be stitched across processes: its vertex indices are
    host-local and its num_vertices/num_edges scalars imply a prefix
    validity mask, both of which are wrong in a cross-host address space.
    Multi-host data parallelism uses the STACKED layout instead
    (place_stacked_graph + graph/build.py:build_stacked_graph), where
    every scanned slice is a self-contained single-scene graph."""
    from stinet_tpu.parallel.mesh import graph_sharding
    if jax.process_count() > 1:
        raise NotImplementedError(
            "concatenated batch graphs are single-process only; use "
            "stacked batching for multi-host runs (stacked_batching "
            "config knob / place_stacked_graph)")
    return jax.device_put(
        local_graph, (sharding_fn or graph_sharding)(local_graph, mesh))


def place_stacked_graph(mesh, stacked):
    """Place a STACKED batch (graph/build.py:build_stacked_graph — every
    leaf carries a leading scene axis) on `mesh`, scene axis sharded over
    "data". Multi-process, each host passes its LOCAL slice of the global
    batch (same leaf shapes on every host; the global batch is the
    concatenation over process index) and the returned global jax.Arrays
    span all hosts. Per-scene scalars (num_vertices, ...) are [B] leaves
    and shard the same way, so each scanned slice sees its own scalar.

    Requires local B divisible by the host's device count along "data"
    (one+ whole scenes per device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("data"))
    shardings = jax.tree.map(lambda _: sh, stacked)
    if jax.process_count() <= 1:
        return jax.device_put(stacked, shardings)
    return jax.tree.map(
        lambda leaf, s: jax.make_array_from_process_local_data(
            s, np.asarray(leaf)), stacked, shardings)


def host_local_block(arr):
    """This process's contiguous dim-0 block of a global array sharded on
    dim 0 (np.asarray when fully addressable / replicated). Recovers the
    local batch rows a host contributed through place_stacked_graph — the
    inverse placement, e.g. for per-scene host-side postprocessing (FID
    image buffers, full-scene IoU projection, visualization)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def merge_widths_across_hosts(widths):
    """Max-merge stacked table-width dicts (graph/build.py:table_widths
    format) across processes so every host pads to one global signature.
    Identity single-process. Must be called from the MAIN thread in the
    same program order on every host (it runs a collective)."""
    if jax.process_count() <= 1:
        return dict(widths)
    from jax.experimental import multihost_utils
    # dist slot is None for base edge sets, int for dilated ones
    keys = sorted(widths, key=lambda k: (
        k[0], -1 if k[1] is None else int(k[1]), str(k[2])))
    import zlib
    sig = np.asarray([len(keys), float(zlib.crc32(repr(keys).encode()))],
                     np.float64)
    sigs = multihost_utils.process_allgather(sig)
    if not np.all(sigs == sigs[0]):
        raise RuntimeError(
            "stacked width keys differ across hosts (different dilation "
            f"sets or ELL layouts); this host: {keys}")
    vals = np.asarray([widths[k] for k in keys], np.int64)
    gathered = multihost_utils.process_allgather(vals)
    return {k: int(v) for k, v in zip(keys, np.max(gathered, axis=0))}


def sum_array_across_hosts(arr):
    """Elementwise sum of a same-shape numeric array across processes
    (identity single-process). Used to merge per-host metric accumulators
    (e.g. the full-scene confusion matrix) into one GLOBAL value every
    host can log identically. Must be called in the same program order on
    every host — it runs a collective; call it UNCONDITIONALLY (a host
    with nothing to contribute passes zeros), never behind data-dependent
    gates, or the processes deadlock."""
    if jax.process_count() <= 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    # process_allgather canonicalizes float64 -> float32 under the default
    # jax_enable_x64=False, which would silently round counts past 2^24.
    # Transport each value as TWO float32 planes (hi = f32(v),
    # lo = f32(v - hi): exact for |v| < 2^48 — two 24-bit mantissas) and
    # do the actual summation host-side in float64, which is exact for
    # integer-valued accumulators like confusion matrices.
    v = np.asarray(arr, np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    gathered = multihost_utils.process_allgather(np.stack([hi, lo]))
    g = np.asarray(gathered, np.float64)  # [P, 2, ...]
    return g.sum(axis=(0, 1))


def mean_scalar_metrics(log, weight=1.0):
    """Weighted-average every float value of an epoch-log dict across hosts
    so monitoring decisions (best-checkpoint, early stopping, LR plateau)
    are globally consistent — each host computes metrics on its own data
    shard. `weight` is this host's contribution weight (e.g. its batch
    count; defaults to an unweighted mean). int/bool values pass through
    local (epoch counters etc. are host-uniform by construction). Identity
    single-process.

    The key set must be host-uniform: allgather needs equal shapes, and a
    host missing the monitored metric would silently diverge the monitor
    decisions (barrier deadlock at the save points). Divergence raises
    RuntimeError naming this host's keys instead of hanging."""
    if jax.process_count() <= 1:
        return log
    keys = sorted(k for k, v in log.items()
                  if isinstance(v, (float, np.floating))
                  and not isinstance(v, bool))
    from jax.experimental import multihost_utils
    # key-set uniformity guard: [count, order-sensitive hash]. crc32, not
    # hash(): str hashing is salted per process (PYTHONHASHSEED).
    import zlib
    sig = np.asarray(
        [len(keys),
         float(zlib.crc32("\x00".join(keys).encode()))], np.float64)
    sigs = multihost_utils.process_allgather(sig)  # [P, 2]
    if not np.all(sigs == sigs[0]):
        raise RuntimeError(
            "mean_scalar_metrics: per-host metric key sets differ "
            f"(this host: {keys}). Epoch logs must be host-uniform — "
            "gate data-dependent metrics (e.g. FID sessions) identically "
            "on every process.")
    if not keys:
        return log
    w = float(weight)
    vals = np.asarray([float(log[k]) * w for k in keys] + [w], np.float64)
    gathered = multihost_utils.process_allgather(vals)  # [P, K+1]
    total_w = max(float(np.sum(gathered[:, -1])), 1e-12)
    out = dict(log)
    for k, v in zip(keys, np.sum(gathered[:, :-1], axis=0) / total_w):
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

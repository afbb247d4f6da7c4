"""Multi-host support (parallel/multihost.py). True multi-process runs
need a pod; these tests pin the single-process degenerate behavior (which
the trainers call unconditionally) and the process-count-parameterized
logic via explicit index/count arguments."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model compiles / multi-process launches (>60 s)

from stinet_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def _reset_initialized():
    """Direct assignment, not monkeypatch: monkeypatch.setattr records the
    CURRENT value at call time and restores it at teardown, so using it to
    'reset' a flag a test itself flipped leaks the flipped value into the
    rest of the session."""
    multihost._initialized = False
    yield
    multihost._initialized = False


def test_initialize_noop_without_env(monkeypatch):
    # No coordinator env vars, no explicit args: must NOT call
    # jax.distributed.initialize (plain single-process run stays local).
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert multihost.initialize() is False
    assert called == []
    # A SINGLE-host TPU_WORKER_HOSTNAMES (e.g. this image's axon tunnel
    # sitecustomize sets "localhost") must NOT trigger distributed init —
    # only a comma-separated multi-worker list does.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost.initialize() is False
    assert called == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert multihost.initialize() is True
    assert len(called) == 1


def test_initialize_explicit_args_and_idempotence(monkeypatch):
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert multihost.initialize(coordinator_address="localhost:1234",
                                num_processes=1, process_id=0) is True
    assert len(called) == 1
    # second call is a no-op
    assert multihost.initialize(coordinator_address="localhost:1234") is False
    assert len(called) == 1


def test_primary_and_counts():
    assert multihost.process_count() == 1
    assert multihost.process_index() == 0
    assert multihost.is_primary()


def test_make_global_mesh_shapes():
    mesh = multihost.make_global_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == jax.device_count()
    assert mesh.shape["model"] == 1

    mesh2 = multihost.make_global_mesh(model_parallel=2)
    assert mesh2.shape["data"] == jax.device_count() // 2
    assert mesh2.shape["model"] == 2
    # every global device appears exactly once
    ids = sorted(d.id for d in mesh2.devices.ravel())
    assert ids == sorted(d.id for d in jax.devices())

    with pytest.raises(AssertionError):
        multihost.make_global_mesh(model_parallel=3)


def test_local_scene_shard_partition():
    items = [f"scene{i:04d}" for i in range(11)]
    # single process: identity
    assert multihost.local_scene_shard(items) == items
    # explicit 4-way shard: disjoint cover, balanced within 1
    shards = [multihost.local_scene_shard(items, index=i, count=4)
              for i in range(4)]
    flat = sorted(s for sh in shards for s in sh)
    assert flat == sorted(items)
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # deterministic
    assert shards[2] == multihost.local_scene_shard(items, index=2, count=4)


def test_global_graph_from_local_single_process():
    """Single-process assembly == device_put with graph_sharding: same
    values, same shardings (the path trainers hit on one host)."""
    from stinet_tpu.parallel.mesh import graph_sharding
    mesh = multihost.make_global_mesh()
    n = jax.device_count()
    tree = {"x": jnp.arange(16 * n, dtype=jnp.float32).reshape(16 * n, 1),
            "scalar": jnp.float32(3.0)}
    placed = multihost.global_graph_from_local(mesh, tree)
    expect = jax.device_put(tree, graph_sharding(tree, mesh))
    for k in tree:
        np.testing.assert_array_equal(np.asarray(placed[k]),
                                      np.asarray(expect[k]))
        assert placed[k].sharding == expect[k].sharding


def test_mean_scalar_metrics_single_process_identity():
    log = {"epoch": 3, "loss": 0.5, "name": "scene0000_00", "flag": True}
    assert multihost.mean_scalar_metrics(log) == log


def test_sync_hosts_noop():
    multihost.sync_hosts("test")  # must not raise single-process


def test_base_trainer_gates_saves_on_primary(monkeypatch, tmp_path):
    """Non-primary processes must not write checkpoints or TB files."""
    from stinet_tpu.trainers.base import BaseTrainer

    class _Cfg:
        resume = None
        dry_run = False
        save_dir = tmp_path / "models"
        log_dir = tmp_path / "log"

        def __getitem__(self, k):
            return {"trainer": {"epochs": 1, "save_period": 1,
                                "monitor": "min val_loss",
                                "tensorboard": True}}[k]

        def get_logger(self, *a, **kw):
            import logging
            return logging.getLogger("test_multihost")

    saves = []

    class _Trainer(BaseTrainer):
        def _train_epoch(self, epoch):
            return {"val_loss": 0.1}

        def _eval(self, mode):
            pass

        def _save_checkpoint(self, epoch):
            saves.append(("ckpt", epoch))

        def _save_best(self, epoch):
            saves.append(("best", epoch))

    monkeypatch.setattr(multihost, "is_primary", lambda: False)
    t = _Trainer(_Cfg())
    assert t.writer.writer is None  # TB gated off on non-primary
    t.train()
    assert saves == []  # no filesystem writes on non-primary

    monkeypatch.setattr(multihost, "is_primary", lambda: True)
    t2 = _Trainer(_Cfg())
    t2.train()
    assert ("ckpt", 1) in saves and ("best", 1) in saves

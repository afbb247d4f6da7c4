"""Subprocess driver: full sharded-STINet fwd+bwd equality on a 16-device
virtual CPU mesh (VERDICT r4 item 8 — catch ring-plan/schedule bugs that
only appear past 8 partitions), plus a dryrun_multichip(16) smoke.
Runs in its own process because the test session pins the virtual device
count to 8 (tests/conftest.py)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
os.environ["STINET_DISABLE_GIT_TAG"] = "1"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from stinet_tpu.graph.build import build_hierarchical_graph  # noqa: E402
from stinet_tpu.graph.partition import partition_hierarchy  # noqa: E402
from stinet_tpu.models.factory import define_G  # noqa: E402
from stinet_tpu.parallel.sharded_stinet import (  # noqa: E402
    make_sharded_stinet, make_sharded_train_step, place_partitioned)
from stinet_tpu.trainers.graph_common import (  # noqa: E402
    build_optimizer, inpainting_loss)
from stinet_tpu.utils.synthetic import synthetic_scene  # noqa: E402

assert jax.device_count() == 16, jax.device_count()

# enough vertices that every one of the 16 coarsest-level parts is
# non-trivially populated after two poolings
scene = synthetic_scene(num_vertices=1600, levels=3, seed=5,
                        dilation_dists=(2, 4))
model = define_G(
    input_nc=10, output_nc=3, ngf=8, n_blocks=3, dilations=[1, 2, 4],
    norm="instance", pooling_type="max", n_levels=2,
    n_repeated_io_convs=1, filter_type="edgeconvtransinv",
    checkpoint_bottleneck=False)
g = build_hierarchical_graph([scene])
params = jax.jit(model.init)(jax.random.key(0), g)["params"]
out_single = np.asarray(model.apply({"params": params}, g))

mesh = Mesh(np.array(jax.devices()), ("data",))
pg, info = partition_hierarchy(scene, 16)
apply_fn = make_sharded_stinet(mesh, model)
pg_dev = place_partitioned(mesh, pg)
out_sh = np.asarray(apply_fn(params, pg_dev))
nv0 = scene.num_vertices[0]
np.testing.assert_allclose(out_sh[info.new_id[0]], out_single[:nv0],
                           rtol=1e-4, atol=1e-5)


def loss_single(p):
    out = model.apply({"params": p}, g)
    vmask = g.levels[0].vertex_mask()
    loss, _ = inpainting_loss(out, g.color, g.mask, vmask, True)
    return loss


l1, g1 = jax.value_and_grad(loss_single)(params)
tx, _ = build_optimizer({"type": "Adam", "args": {"lr": 1e-3}})
step, loss_fn = make_sharded_train_step(mesh, model, tx,
                                        use_mask_weighted=True)
l2, g2 = jax.value_and_grad(loss_fn)(params, pg_dev)
np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
flat2 = {jax.tree_util.keystr(k): v
         for k, v in jax.tree_util.tree_leaves_with_path(g2)}
flat1 = jax.tree_util.tree_leaves_with_path(g1)
assert len(flat1) == len(flat2)
for k, v in flat1:
    key = jax.tree_util.keystr(k)
    np.testing.assert_allclose(np.asarray(flat2[key]), np.asarray(v),
                               rtol=5e-4, atol=2e-4, err_msg=key)

# dryrun smoke at 16 — same entry the driver exercises, one size up
import __graft_entry__  # noqa: E402
__graft_entry__.dryrun_multichip(16)
print("MESH16_OK", flush=True)

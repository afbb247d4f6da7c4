"""Per-step batch H2D cost: per-leaf device_put vs packed transfer.

The flagship bench keeps its graph RESIDENT, so it never shows the cost a
real training loop pays every step: moving the freshly assembled padded
batch (~77 leaves) host->device. trainers/graph_common.py:place_* now
routes the single-device path through the packed transfer with
compress_indices=False (pure host-side concatenation); this script
measures what that buys on live hardware:

  per_leaf     jax.device_put(graph)            (the old path)
  packed_raw   device_put_packed(compress=False) (the new trainer path)
  packed_comp  device_put_packed(compress=True)  (the serving wire path)

Each timed WITH a blocking sync so the transfer cost is fully counted.
One JSON line per variant. Env: BENCH_V (default 65536), BENCH_ITERS
(default 10).
"""
import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V = int(os.environ.get("BENCH_V", 65536))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # tiny first dispatch absorbs tunnel recovery (BENCH_NOTES round 5)
    float(jnp.sum(jnp.ones((2, 2)) @ jnp.ones((2, 2))))

    from bench import build_scene_of
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.transfer import device_put_packed

    graph = build_hierarchical_graph([build_scene_of("grid", 0)])
    leaves = jax.tree_util.tree_leaves(graph)
    mbytes = sum(x.nbytes for x in leaves) / 1e6

    @jax.jit
    def consume(tree):
        # touch every leaf with one tiny program -> ONE host sync. A
        # per-leaf block_until_ready costs one tunnel round-trip PER LEAF
        # (~26 ms x 77 = 2 s — the first version of this script measured
        # exactly that artifact on every variant); a real train step
        # consumes the whole tree in one dispatch, so this is the honest
        # completion fence.
        return sum(jnp.ravel(x)[:1].astype(jnp.float32).sum()
                   for x in jax.tree_util.tree_leaves(tree))

    def sync(tree):
        float(consume(tree))

    variants = [
        ("per_leaf", lambda: jax.device_put(graph)),
        ("packed_raw", lambda: device_put_packed(graph,
                                                 compress_indices=False)),
        ("packed_comp", lambda: device_put_packed(graph,
                                                  compress_indices=True)),
    ]
    for name, put in variants:
        sync(put())  # warm (unpack/consume program compiles)
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            sync(put())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(json.dumps({
            "variant": name, "ms_min": round(1e3 * ts[0], 2),
            "ms_median": round(1e3 * ts[len(ts) // 2], 2),
            "n_leaves": len(leaves), "mbytes": round(mbytes, 1),
            "platform": jax.devices()[0].platform}), flush=True)

    # ---- train loop: serial place->step->sync vs iter_placed overlap ----
    # Emulates the trainer epoch with a FRESH host batch each step (the
    # resident-graph train bench hides this). Same shapes -> one compile.
    import dataclasses

    import numpy as np
    import optax

    from stinet_tpu.models.factory import define_G
    from stinet_tpu.trainers.graph_common import (
        build_optimizer, inpainting_loss, iter_placed)

    # one build, three content-perturbed copies: real loaders pin widths
    # via bucket signatures/ratchets; differing per-seed table widths
    # would spuriously recompile the AOT step here
    base = build_hierarchical_graph([build_scene_of("grid", 0)])
    graphs = [dataclasses.replace(base, x=base.x + np.float32(i) * 1e-6)
              for i in range(3)]
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1],
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv", dtype="float32")
    model = dataclasses.replace(model, remat_io_blocks=False)
    g0 = device_put_packed(graphs[0], compress_indices=False)
    params = jax.device_put(
        jax.jit(model.init)(jax.random.key(0), g0)["params"])
    tx, lr = build_optimizer({"type": "Adam",
                              "args": {"lr": 7e-5, "amsgrad": True}})
    opt_state = jax.device_put(tx.init(params))
    vmask0 = g0.levels[0].vertex_mask()

    def step_fn(p, o, g):
        def lf(pp):
            out = model.apply({"params": pp}, g)
            return inpainting_loss(out, g.color, g.mask, vmask0, True)[0]
        loss, grads = jax.value_and_grad(lf)(p)
        upd, o = tx.update(grads, o, p)
        upd = jax.tree.map(lambda u: u * jnp.float32(lr), upd)
        return optax.apply_updates(p, upd), o, loss

    absd = lambda t: jax.tree.map(  # noqa: E731 — AOT compile/dispatch
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), t)
    step = jax.jit(step_fn).lower(absd(params), absd(opt_state),
                                  absd(g0)).compile()
    place = lambda g: device_put_packed(g, compress_indices=False)  # noqa

    n_steps = max(2 * ITERS, 12)

    def run_serial():
        p, o = params, opt_state
        for i in range(n_steps):
            g = place(graphs[i % len(graphs)])
            p, o, loss = step(p, o, g)
            float(loss)  # the trainer's per-step metric sync
        return p

    def run_overlap():
        p, o = params, opt_state
        batches = ((graphs[i % len(graphs)], None) for i in range(n_steps))
        for g, _ in iter_placed(batches, place, overlap=True):
            p, o, loss = step(p, o, g)
            float(loss)
        return p

    for name, fn in (("train_serial", run_serial),
                     ("train_overlap", run_overlap)):
        fn()  # warm
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / n_steps
        print(json.dumps({"variant": name,
                          "ms_per_step": round(1e3 * dt, 2),
                          "steps": n_steps}), flush=True)


if __name__ == "__main__":
    main()

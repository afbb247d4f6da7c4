"""Batched-serving regression probe (round 3).

`bench.py` B=4 batched serving measures ~1.85x worse per vertex than the
single-scene dispatch even after the one-hot norm matmuls (BENCH_NOTES
round-3 post-one-hot table: 59.9 ms/dispatch vs 4 x 8.09 = 32.4 ms ideal).
This probe isolates WHERE the superlinearity lives by timing, on the real
device:

  1. full forward, B=1 graph (as bench.py primary)
  2. full forward, B=4 graph as built (num_graphs=4 -> one-hot norm path)
  3. full forward, B=4 shapes but graph_id:=0 / num_graphs:=1 (same tensor
     shapes, single-graph norm code path; numerics differ, compute doesn't)
  4. masked_instance_norm microbench at the B=4 level-0 shape, G=1 vs G=4
  5. ELL aggregate microbench at the B=1 vs B=4 level-0 tables

If (3) lands near 4x the B=1 time, the gap is entirely the multi-graph
norm handling; if (3) is already slow, the cost is shape-driven (gather
locality / XLA program shape) and the norm path is innocent.

Prints one JSON line per stage (cumulative keys), same contract as
bench.py so the retry queue can capture partial progress.
"""
import dataclasses
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax

# honor an explicit platform request (the axon plugin overrides the
# JAX_PLATFORMS env var at import time; same dance as bench.py)
_plat = os.environ.get("BENCH_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

import jax.numpy as jnp
import numpy as np

import bench
from stinet_tpu.graph.build import build_hierarchical_graph
from stinet_tpu.models.factory import define_G
from stinet_tpu.ops.norms import masked_instance_norm

ITERS = int(os.environ.get("BENCH_ITERS", 20))
V = bench.V


def _sync(x):
    return float(jnp.sum(x))


def _time_fwd(model, params, graph, iters=ITERS):
    @jax.jit
    def chain(params, graph, out):
        x = graph.x.at[:, 0:3].add(out * 1e-6)
        return model.apply({"params": params},
                           dataclasses.replace(graph, x=x))

    out = chain(params, graph,
                jnp.zeros((graph.x.shape[0], 3), graph.x.dtype))
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(params, graph, out)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    acc = {"V": V, "iters": ITERS,
           "platform": jax.devices()[0].platform}

    def emit():
        print(json.dumps(acc), flush=True)

    scenes = [bench.build_scene(seed=i) for i in range(4)]
    g1 = jax.device_put(build_hierarchical_graph(scenes[:1]))
    g4 = jax.device_put(build_hierarchical_graph(scenes))

    model = define_G(input_nc=10, output_nc=3, ngf=bench.NGF,
                     n_blocks=bench.N_BLOCKS, dilations=bench.DILATIONS,
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1, filter_type="edgeconvtransinv",
                     dtype="float32")
    params = jax.device_put(
        jax.jit(model.init)(jax.random.key(0), g1)["params"])

    acc["fwd_b1_ms"] = round(_time_fwd(model, params, g1) * 1e3, 2)
    emit()

    acc["fwd_b4_ms"] = round(_time_fwd(model, params, g4) * 1e3, 2)
    emit()

    # B=4 shapes, single-graph code path: zero the graph ids everywhere and
    # claim num_graphs=1. Pad rows keep id 0 too — fine for timing (the
    # masked reductions still run; values differ, shapes/programs don't).
    g4_as1 = dataclasses.replace(
        g4,
        levels=tuple(
            dataclasses.replace(l, graph_id=jnp.zeros_like(l.graph_id))
            for l in g4.levels),
        num_graphs=1)
    acc["fwd_b4_g1_ms"] = round(_time_fwd(model, params, g4_as1) * 1e3, 2)
    emit()

    # stacked+vmapped B=4 (serving's fast batched layout): per-scene 65k
    # tables with a leading scene axis — every gather stays inside its own
    # scene's table, dodging the concat-table locality cliff above.
    from stinet_tpu.serving import SceneInpainter
    try:
        server = SceneInpainter(model, params, geometric=False)
        gs = server._build_stacked(scenes)

        @jax.jit
        def vchain(params, g, out):
            x = g.x.at[:, :, 0:3].add(out * 1e-6)
            return jax.vmap(
                lambda p, gg: model.apply({"params": p}, gg),
                in_axes=(None, 0))(params, dataclasses.replace(g, x=x))

        out = vchain(params, gs,
                     jnp.zeros(gs.x.shape[:2] + (3,), gs.x.dtype))
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = vchain(params, gs, out)
        _sync(out)
        acc["vfwd_b4_ms"] = round(
            (time.perf_counter() - t0) / ITERS * 1e3, 2)
        emit()

        # stacked + SCANNED B=4 (the production stacked layout after the
        # vmap verdict above: lax.map keeps each scene's gathers at
        # single-scene locality inside one dispatch)
        @jax.jit
        def schain(params, g, out):
            x = g.x.at[:, :, 0:3].add(out * 1e-6)
            return jax.lax.map(
                lambda gg: model.apply({"params": params}, gg),
                dataclasses.replace(g, x=x))

        try:
            out = schain(params, gs,
                         jnp.zeros(gs.x.shape[:2] + (3,), gs.x.dtype))
            _sync(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = schain(params, gs, out)
            _sync(out)
            acc["sfwd_b4_ms"] = round(
                (time.perf_counter() - t0) / ITERS * 1e3, 2)
        except ValueError as e:  # scan stage failed after vmap succeeded
            acc["sfwd_b4_ms"] = None
            acc["sfwd_b4_error"] = str(e)[:120]
        del server, gs
    except ValueError as e:   # scenes couldn't share a stacked signature
        acc.setdefault("vfwd_b4_ms", None)
        acc.setdefault("sfwd_b4_ms", None)
        acc["vfwd_b4_error"] = str(e)[:120]
    emit()

    # stacked vs concatenated TRAINING step at B=4 (the training-side
    # counterpart of sfwd_b4: the stacked_batching loader path,
    # make_stacked_inpainting_steps — exact-loss scan-accumulated step)
    try:
        import optax
        from stinet_tpu.graph.build import build_stacked_graph
        from stinet_tpu.trainers.graph_common import (
            TrainState, build_optimizer, inpainting_loss,
            make_stacked_inpainting_steps)
        tx, lr = build_optimizer({"type": "Adam",
                                  "args": {"lr": 7e-5, "amsgrad": True}})
        sg, _ = build_stacked_graph(scenes, geometric=False)
        sg = jax.device_put(sg)
        # the stacked step donates its state — give it a COPY so the shared
        # `params` buffers survive for the later stages
        p_copy = jax.tree.map(jnp.copy, params)
        state = TrainState(params=p_copy, opt_state=tx.init(p_copy),
                           step=jnp.zeros((), jnp.int32), batch_stats=None)
        sstep, _ = make_stacked_inpainting_steps(model, tx, True)
        state, m = sstep(state, sg, jnp.float32(lr))
        _sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(max(ITERS // 2, 3)):
            state, m = sstep(state, sg, jnp.float32(lr))
        _sync(m["loss"])
        acc["strain_b4_ms"] = round(  # scan-over-scenes stacked step
            (time.perf_counter() - t0) / max(ITERS // 2, 3) * 1e3, 2)
        emit()

        # concatenated-train comparator at the same 4 scenes
        @jax.jit
        def cstep(state, g, lr):
            def loss_fn(p):
                out = model.apply({"params": p}, g)
                vmask = g.levels[0].vertex_mask()
                loss, comp = inpainting_loss(out, g.color, g.mask, vmask,
                                             True)
                return loss, comp
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            upd, opt_state = tx.update(grads, state.opt_state, state.params)
            upd = jax.tree.map(lambda u: u * lr, upd)
            return state.replace(
                params=optax.apply_updates(state.params, upd),
                opt_state=opt_state, step=state.step + 1), loss
        p_copy2 = jax.tree.map(jnp.copy, params)
        cst = TrainState(params=p_copy2, opt_state=tx.init(p_copy2),
                         step=jnp.zeros((), jnp.int32), batch_stats=None)
        cst, loss = cstep(cst, g4, jnp.float32(lr))
        _sync(loss)
        t0 = time.perf_counter()
        for _ in range(max(ITERS // 2, 3)):
            cst, loss = cstep(cst, g4, jnp.float32(lr))
        _sync(loss)
        acc["ctrain_b4_ms"] = round(
            (time.perf_counter() - t0) / max(ITERS // 2, 3) * 1e3, 2)
        del state, cst, sg
        emit()
    except ValueError as e:
        acc["vtrain_b4_error"] = str(e)[:120]
        emit()

    # matmul-reduce norm sums (w.T @ x instead of jnp.sum) — flag is read
    # at trace time, so toggling the env between fresh jits works here
    os.environ["STINET_NORM_MATMUL_REDUCE"] = "1"
    acc["fwd_b1_mm_ms"] = round(_time_fwd(model, params, g1) * 1e3, 2)
    emit()
    acc["fwd_b4_mm_ms"] = round(_time_fwd(model, params, g4_as1) * 1e3, 2)
    emit()
    del os.environ["STINET_NORM_MATMUL_REDUCE"]

    # windowed bf16: single vs batched. The windowed kernel streams
    # fixed-size sender windows, so its cost should be insensitive to the
    # total table size — the candidate fix for the batched gather-locality
    # collapse (agg_b4 ~5.6x agg_b1 above).
    model16 = define_G(input_nc=10, output_nc=3, ngf=bench.NGF,
                       n_blocks=bench.N_BLOCKS, dilations=bench.DILATIONS,
                       norm="instance", pooling_type="max", n_levels=2,
                       n_repeated_io_convs=1,
                       filter_type="edgeconvtransinv", dtype="bfloat16")
    for tag, built in (
            ("wfwd_b1_ms", scenes[:1]),
            ("wfwd_b4_ms", scenes)):
        gw = jax.device_put(build_hierarchical_graph(built, windowed=True))
        p16 = jax.device_put(
            jax.jit(model16.init)(jax.random.key(0), gw)["params"])
        acc[tag] = round(_time_fwd(model16, p16, gw) * 1e3, 2)
        emit()
        del gw, p16

    # norm microbench at the B=4 level-0 shape
    v_pad = g4.levels[0].graph_id.shape[0]
    gid = jax.device_put(g4.levels[0].graph_id)
    vmask = (gid < 4)
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (v_pad, 64), dtype=np.float32)))

    for tag, ng, ids in (("norm_g1_ms", 1, jnp.zeros_like(gid)),
                         ("norm_g4_ms", 4, gid)):
        f = jax.jit(lambda x, i, n=ng, m=vmask.astype(jnp.float32):
                    masked_instance_norm(x, i, n, m))
        y = f(x, ids)
        _sync(y)
        t0 = time.perf_counter()
        for _ in range(50):
            y = f(y, ids)
        _sync(y)
        acc[tag] = round((time.perf_counter() - t0) / 50 * 1e3, 3)
        emit()

    # ELL aggregate microbench, level-0 tables, B=1 vs B=4
    from stinet_tpu.ops.message_passing import edge_conv_aggregate
    for tag, g in (("agg_b1_ms", g1), ("agg_b4_ms", g4)):
        lvl = g.levels[0]
        xa = jnp.asarray(np.random.default_rng(1).standard_normal(
            (lvl.graph_id.shape[0], 64), dtype=np.float32))

        def agg(x, e=lvl.edges):
            return edge_conv_aggregate(
                x, x, e.src, e.dst, num_segments=e.degree.shape[0],
                aggr="mean", degree=e.degree.astype(x.dtype), nbr=e.nbr,
                rev_dst=e.rev_dst, out_degree=e.out_degree,
                ell_degree=e.ell_degree, spill_src=e.spill_src,
                spill_dst=e.spill_dst, halo=e.halo)

        f = jax.jit(agg)
        y = f(xa)
        _sync(y)
        t0 = time.perf_counter()
        for _ in range(50):
            y = f(y)
        _sync(y)
        acc[tag] = round((time.perf_counter() - t0) / 50 * 1e3, 3)
        emit()


if __name__ == "__main__":
    main()

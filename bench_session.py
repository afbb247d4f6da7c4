"""One-process measurement session for a whole round's hardware numbers.

The axon tunnel wedges for minutes after any abnormal client exit and
throttles bursts of short-lived clients (bench.py module docstring), so ad
hoc per-question probe scripts are self-defeating: every extra client makes
the next one slower. This script is the round's ONE tunnel client — it runs
every open measurement sequentially in a single process and prints one JSON
line per result (all flushed, so a kill keeps completed stages):

  flagship        f32 inference, V=65536 grid (bench.py headline)
  pallas_norm     direct XLA-vs-Pallas instance-norm kernel A/B (VERDICT r3
                  item 6 — the knob was deleted after the kernel lost;
                  this re-validates the recorded verdict)
  bf16_windowed   bf16 + RCM-windowed production config
  train_breakdown grad / grad+opt / grad+opt+metrics (fused ELL metric cost,
                  VERDICT r3 item 2)
  stacked_b4      scanned stacked forward/train vs concatenated at B=4
                  (VERDICT r3 item 2 — replace 'expected' numbers)
  cost_analysis   XLA per-program bytes/flops of the flagship forward
                  (VERDICT r3 item 3 — the residual-traffic agenda)
  torch_cpu       pinned-thread reference denominator (median of 3)

Env: BENCH_V (default 65536), BENCH_ITERS (default 30), SESSION_SKIP
(comma-separated stage names to skip), SESSION_COOLDOWN_S (supervisor
retry cooldown, default 240).

`--supervise` (VERDICT r4 item 5): run the session as a subprocess; if the
worker dies abnormally (the tunnel's sporadic worker-crash class — see
BENCH_NOTES round-4 crash log), wait out the tunnel's post-crash recovery
window (measured 150-370 s) and relaunch ONCE, skipping every stage that
already emitted a clean line, so a single mid-session crash costs one
cooldown instead of the round's remaining measurements.
"""
import dataclasses
import json
import os
import signal
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V = int(os.environ.get("BENCH_V", 65536))
ITERS = int(os.environ.get("BENCH_ITERS", 30))
SKIP = set(filter(None, os.environ.get("SESSION_SKIP", "").split(",")))
NGF, N_BLOCKS = 64, 9
DILATIONS = [1, 1, 1, 2, 4, 8, 16, 1, 1]
T0 = time.time()


def emit(stage, **kw):
    print(json.dumps({"stage": stage, "t": round(time.time() - T0, 1),
                      **kw}), flush=True)


def note(msg):
    print(f"[session {time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    # neutralize bench.py's wall budget (this session manages its own time)
    os.environ["BENCH_DEADLINE"] = str(time.time() + 10**6)
    import jax
    import jax.numpy as jnp

    from bench import bench_torch_cpu, build_scene
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G

    def timed(fn, x0, iters=ITERS, sync=None):
        """Time fn feeding its output back as input (unique dispatches:
        defeats transparent result caching in the tunnel; warms both the
        seed-input and loop-input jit signatures)."""
        out = fn(x0)
        out = fn(out)
        float(jnp.sum(sync(out) if sync else out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(out)
        float(jnp.sum(sync(out) if sync else out))
        return (time.perf_counter() - t0) / iters

    note("building flagship scene")
    scene = build_scene()
    graph = jax.device_put(build_hierarchical_graph([scene]))

    def make_model(dtype):
        return define_G(input_nc=10, output_nc=3, ngf=NGF,
                        n_blocks=N_BLOCKS, dilations=DILATIONS,
                        norm="instance", pooling_type="max", n_levels=2,
                        n_repeated_io_convs=1,
                        filter_type="edgeconvtransinv", dtype=dtype)

    model = make_model("float32")
    note("first dispatch (absorbs any tunnel recovery)")
    params = jax.device_put(
        jax.jit(model.init)(jax.random.key(0), graph)["params"])
    note("first dispatch done")

    def chain_fn(m):
        @jax.jit
        def chain(params, graph, out):
            x = graph.x.at[:, 0:3].add(out.astype(graph.x.dtype) * 1e-6)
            return m.apply({"params": params},
                           dataclasses.replace(graph, x=x))
        return chain

    out0 = jnp.zeros((graph.x.shape[0], 3), jnp.float32)

    # ---- flagship f32 -----------------------------------------------------
    # guarded: the tunnel's sporadic "TPU backend error (Internal)" crash
    # class (BENCH_NOTES round 3/4) must not kill the later compile-only
    # stages — a poisoned backend makes them fail too, but each failure is
    # then recorded per stage instead of aborting the session.
    if "flagship" not in SKIP:
        try:
            chain = chain_fn(model)
            dt = timed(lambda o: chain(params, graph, o), out0,
                       sync=lambda o: o.astype(jnp.float32))
            emit("flagship", ms_per_scene=round(dt * 1e3, 3),
                 vertices_per_sec=round(V / dt, 1), V=V, dtype="float32",
                 platform=jax.devices()[0].platform)
        except Exception as e:  # noqa: BLE001
            emit("flagship", error=f"{type(e).__name__}: {e}"[:300])

    # ---- pallas instance norm A/B (direct kernel micro-bench; the
    # production dispatch knob was removed after round 4's measurement —
    # ops/pallas/README.md — this stage re-validates the verdict) ---------
    if "pallas_norm" not in SKIP:
        try:
            from stinet_tpu.ops.norms import masked_instance_norm
            from stinet_tpu.ops.pallas.instance_norm import (
                pallas_instance_norm)
            h = jax.random.normal(jax.random.key(1), (V, 128), jnp.float32)
            nv = graph.levels[0].num_vertices
            gid = graph.levels[0].graph_id
            vm = graph.levels[0].vertex_mask(dtype=jnp.float32)
            dt_x = timed(lambda a: masked_instance_norm(a, gid, 1, vm) + h,
                         h)
            dt_p = timed(lambda a: pallas_instance_norm(a, nv) + h, h)
            emit("pallas_norm", xla_ms=round(dt_x * 1e3, 3),
                 pallas_ms=round(dt_p * 1e3, 3))
        except Exception as e:  # noqa: BLE001 — record, keep session alive
            emit("pallas_norm", error=f"{type(e).__name__}: {e}"[:300])

    # ---- bf16 windowed ----------------------------------------------------
    if "bf16_windowed" not in SKIP:
        try:
            graph_w = jax.device_put(
                build_hierarchical_graph([scene], windowed=True))
            chain16 = chain_fn(make_model("bfloat16"))
            dt16 = timed(lambda o: chain16(params, graph_w, o), out0,
                         sync=lambda o: o.astype(jnp.float32))
            emit("bf16_windowed", ms_per_scene=round(dt16 * 1e3, 3))
            del graph_w
        except Exception as e:  # noqa: BLE001
            emit("bf16_windowed", error=f"{type(e).__name__}: {e}"[:300])

    # ---- train breakdown (fused metrics cost) -----------------------------
    if "train_breakdown" not in SKIP:
        import optax
        from stinet_tpu.trainers.graph_common import (
            build_optimizer, inpainting_loss, inpainting_metrics)
        tmodel = dataclasses.replace(model, remat_io_blocks=False)
        tx, lr = build_optimizer({"type": "Adam",
                                  "args": {"lr": 7e-5, "amsgrad": True}})
        opt_state = jax.device_put(tx.init(params))
        vmask = graph.levels[0].vertex_mask()

        def loss_fn(p, g):
            pred = tmodel.apply({"params": p}, g)
            return inpainting_loss(pred, g.color, g.mask, vmask, True)[0]

        @jax.jit
        def grad_only(p, g):
            return jax.value_and_grad(loss_fn)(p, g)[1]

        def opt_step(p, o, grads):
            upd, o = tx.update(grads, o, p)
            upd = jax.tree.map(lambda u: u * jnp.float32(lr), upd)
            return optax.apply_updates(p, upd), o

        @jax.jit
        def grad_opt(p, o, g):
            return opt_step(p, o, grad_only(p, g))

        @jax.jit
        def grad_opt_metrics(p, o, g):
            def lf(pp):
                pred = tmodel.apply({"params": pp}, g)
                loss, comp = inpainting_loss(pred, g.color, g.mask, vmask,
                                             True)
                return loss, comp
            (loss, comp), grads = jax.value_and_grad(lf, has_aux=True)(p)
            p2, o2 = opt_step(p, o, grads)
            return p2, o2, inpainting_metrics(comp, graph, loss)

        try:
            it = max(ITERS // 3, 5)
            grads = grad_only(params, graph)
            float(jnp.sum(jax.tree_util.tree_leaves(grads)[0]))
            t0 = time.perf_counter()
            for _ in range(it):
                # perturb params by the last grads so every dispatch is
                # unique
                pshift = jax.tree.map(lambda p, g: p + g * 1e-9, params,
                                      grads)
                grads = grad_only(pshift, graph)
            float(jnp.sum(jax.tree_util.tree_leaves(grads)[0]))
            dt_g = (time.perf_counter() - t0) / it
            p2, o2 = grad_opt(params, opt_state, graph)
            t0 = time.perf_counter()
            for _ in range(it):
                p2, o2 = grad_opt(p2, o2, graph)
            float(jnp.sum(jax.tree_util.tree_leaves(p2)[0]))
            dt_go = (time.perf_counter() - t0) / it
            p3, o3, m = grad_opt_metrics(params, opt_state, graph)
            t0 = time.perf_counter()
            for _ in range(it):
                p3, o3, m = grad_opt_metrics(p3, o3, graph)
            float(m["loss"])
            dt_gom = (time.perf_counter() - t0) / it
            emit("train_breakdown", grad_ms=round(dt_g * 1e3, 3),
                 grad_opt_ms=round(dt_go * 1e3, 3),
                 grad_opt_metrics_ms=round(dt_gom * 1e3, 3),
                 metrics_overhead_ms=round((dt_gom - dt_go) * 1e3, 3))
        except Exception as e:  # noqa: BLE001
            emit("train_breakdown", error=f"{type(e).__name__}: {e}"[:300])
        del p2, o2, p3, o3, opt_state

    # ---- stacked B=4 (scan) vs concat ------------------------------------
    if "stacked_b4" not in SKIP:
        try:
            import optax
            from stinet_tpu.graph.build import build_stacked_graph
            from stinet_tpu.trainers.graph_common import (
                TrainState, build_optimizer,
                make_stacked_inpainting_steps, inpainting_loss)
            note("building B=4 scenes")
            scenes = [scene] + [build_scene(seed=i) for i in range(1, 4)]
            sg, _ = build_stacked_graph(scenes, geometric=False)
            sg = jax.device_put(sg)

            @jax.jit
            def sfwd(params, g, out):
                x = g.x.at[:, :, 0:3].add(out * 1e-6)
                return jax.lax.map(
                    lambda gg: model.apply({"params": params}, gg),
                    dataclasses.replace(g, x=x))

            o4 = jnp.zeros(sg.x.shape[:2] + (3,), jnp.float32)
            dt_s = timed(lambda o: sfwd(params, sg, o), o4, iters=ITERS // 2)
            emit("stacked_b4", sfwd_b4_ms=round(dt_s * 1e3, 3),
                 per_scene_ms=round(dt_s / 4 * 1e3, 3))

            tx, lr = build_optimizer({"type": "Adam",
                                      "args": {"lr": 7e-5, "amsgrad": True}})
            p_copy = jax.tree.map(jnp.copy, params)
            state = TrainState(params=p_copy, opt_state=tx.init(p_copy),
                               step=jnp.zeros((), jnp.int32),
                               batch_stats=None)
            sstep, _ = make_stacked_inpainting_steps(model, tx, True)
            state, m = sstep(state, sg, jnp.float32(lr))
            float(m["loss"])
            it = max(ITERS // 4, 4)
            t0 = time.perf_counter()
            for _ in range(it):
                state, m = sstep(state, sg, jnp.float32(lr))
            float(m["loss"])
            dt_st = (time.perf_counter() - t0) / it
            emit("stacked_b4", strain_b4_ms=round(dt_st * 1e3, 3),
                 per_scene_train_ms=round(dt_st / 4 * 1e3, 3))
            del state, sg

            g4 = jax.device_put(build_hierarchical_graph(scenes))

            @jax.jit
            def cfwd(params, g, out):
                x = g.x.at[:, 0:3].add(out * 1e-6)
                return model.apply({"params": params},
                                   dataclasses.replace(g, x=x))

            oc = jnp.zeros((g4.x.shape[0], 3), jnp.float32)
            dt_c = timed(lambda o: cfwd(params, g4, o), oc, iters=ITERS // 2)
            emit("stacked_b4", concat_fwd_b4_ms=round(dt_c * 1e3, 3),
                 per_scene_concat_ms=round(dt_c / 4 * 1e3, 3))
            del g4
        except Exception as e:  # noqa: BLE001
            emit("stacked_b4", error=f"{type(e).__name__}: {e}"[:300])

    # ---- XLA cost analysis (traffic agenda) --------------------------------
    # Two programs: the f32 flagship and the bf16 WINDOWED production
    # forward. If bf16's "bytes accessed" drops ~2x but its measured time
    # doesn't (7.61 vs 8.01 ms in round 4), HBM bandwidth is NOT the
    # binding constraint — the gathers are DMA-count/latency-bound and the
    # residual-traffic agenda bottoms out (VERDICT r3 item 3).
    if "cost_analysis" not in SKIP:
        def _cost(tag, m, g):
            try:
                ca = jax.jit(
                    lambda p, gg: m.apply({"params": p}, gg)
                ).lower(params, g).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                keys = ("flops", "bytes accessed", "bytes accessed output",
                        "optimal_seconds")
                emit("cost_analysis", program=tag,
                     **{k.replace(" ", "_"): float(ca[k])
                        for k in keys if k in ca})
            except Exception as e:  # noqa: BLE001
                emit("cost_analysis", program=tag,
                     error=f"{type(e).__name__}: {e}"[:300])

        _cost("flagship_f32", model, graph)
        try:
            graph_w16 = jax.device_put(
                build_hierarchical_graph([scene], windowed=True))
            _cost("bf16_windowed", make_model("bfloat16"), graph_w16)
            del graph_w16
        except Exception as e:  # noqa: BLE001
            emit("cost_analysis", program="bf16_windowed",
                 error=f"{type(e).__name__}: {e}"[:300])

    # ---- torch CPU denominator (host-heavy; last) --------------------------
    if "torch_cpu" not in SKIP:
        note("torch-CPU baseline")
        cpu_vps, cpu_dt, runs = bench_torch_cpu(scene, 3)
        emit("torch_cpu", ms_per_scene=round(cpu_dt * 1e3, 1),
             vertices_per_sec=round(cpu_vps, 1), median_of=runs)

    note("session complete")


def supervise():
    """Crash-tolerant wrapper (module docstring). Re-prints every worker
    line immediately; a clean (error-free) stage line marks that stage done
    so the relaunch skips it. Exactly one retry: repeated crashes mean the
    host/tunnel is sick and burning more cooldowns helps nobody."""
    import subprocess
    done = set(SKIP)
    cooldown = float(os.environ.get("SESSION_COOLDOWN_S", 240))
    for attempt in range(2):
        env = dict(os.environ, SESSION_SKIP=",".join(sorted(done)))
        proc = subprocess.Popen([sys.executable, __file__], env=env,
                                stdout=subprocess.PIPE, text=True)
        for line in proc.stdout:
            line = line.strip()
            print(line, flush=True)
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if row.get("stage") and "error" not in row:
                done.add(row["stage"])
        rc = proc.wait()
        if rc == 0:
            return
        note(f"worker died rc={rc} after stages {sorted(done)}")
        if attempt == 0:
            note(f"cooldown {cooldown:.0f}s (tunnel post-crash recovery), "
                 f"then one retry")
            time.sleep(cooldown)
    note("giving up after retry; completed stages stand")


if __name__ == "__main__":
    if "--supervise" in sys.argv:
        supervise()
    else:
        main()

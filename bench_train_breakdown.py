"""Train-step cost breakdown on the flagship 3D config (one chip).

Times, each as its own jitted program on the same scene:
  fwd            — inference forward (the 8.4 ms headline path)
  grad           — value_and_grad of the masked L1 loss (fwd + bwd)
  grad+opt       — plus adam/amsgrad update (bench.py's train-step stage)
  grad+opt+metr  — plus the full per-step metric dict the production
                   trainer computes (graph TV / laplace variance / PSNRs,
                   trainers/graph_common.py:inpainting_metrics)
  donated        — grad+opt with params/opt_state donated (the trainer's
                   actual aliasing, graph_common.py:266)
  fwd/grad norm=none — the same network with every norm layer removed
                   (same tables, same gathers): fwd delta attributes the
                   norm forward cost, grad delta the norm fwd+VJP cost —
                   the VERDICT r4 item 3 backward-pass attribution that a
                   profiler can't give through the tunnel.

The residual grad-minus-fwd time after subtracting the norm VJP is the
gather/scatter VJP + weight-matmul VJP core: the EdgeConv gathers'
backward is a segment scatter-add (ops/message_passing.py), which is the
piece the windowed one-hot path turns back into MXU matmuls — compare
BENCH_WINDOWED=1.

Prints one JSON line per stage. Env: BENCH_V, BENCH_ITERS, BENCH_DTYPE,
BENCH_SCENE (grid|sphere|terrain), STINET_WINDOWED* knobs as usual.
"""
import dataclasses
import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V = int(os.environ.get("BENCH_V", 65536))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
WINDOWED = os.environ.get("BENCH_WINDOWED", "0") == "1"


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM"):  # axon overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import optax

    from bench import build_scene
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    from stinet_tpu.trainers.graph_common import (
        build_optimizer, inpainting_loss, inpainting_metrics)

    # tiny first dispatch: absorbs tunnel recovery (150-370 s after an
    # abnormal client exit) on a 2x2 matmul instead of the full flagship
    # init — the crash log (BENCH_NOTES round 4/5) implicates LARGE-program
    # data dispatches right after recovery
    t0 = time.time()
    float(jnp.sum(jnp.ones((2, 2)) @ jnp.ones((2, 2))))
    print(json.dumps({"probe_dispatch_s": round(time.time() - t0, 1),
                      "platform": jax.devices()[0].platform}), flush=True)

    scene = build_scene()
    graph = jax.device_put(
        build_hierarchical_graph([scene], windowed=WINDOWED))
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1],
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1, filter_type="edgeconvtransinv",
                     dtype=DTYPE)
    model = dataclasses.replace(model, remat_io_blocks=False)
    params = jax.device_put(
        jax.jit(model.init)(jax.random.key(0), graph)["params"])
    tx, lr = build_optimizer({"type": "Adam",
                              "args": {"lr": 7e-5, "amsgrad": True}})
    opt_state = jax.device_put(tx.init(params))
    vmask = graph.levels[0].vertex_mask()

    def loss_fn(p, g):
        out = model.apply({"params": p}, g)
        loss, comp = inpainting_loss(out, g.color, g.mask, vmask, True)
        return loss, comp

    def perturb(g, s):
        # unique input per iter: defeats tunnel-side result caching
        return dataclasses.replace(g, x=g.x.at[:, 0:3].add(s * 1e-6))

    def stage_fwd(params, opt_state, g, s):
        return jnp.sum(loss_fn(params, perturb(g, s))[1]), params, opt_state

    def stage_grad(params, opt_state, g, s):
        (_, comp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, perturb(g, s))
        return jnp.sum(comp) + jax.tree.reduce(
            lambda a, b: a + jnp.sum(b), grads, 0.0), params, opt_state

    def _opt(params, opt_state, g, s, metrics):
        gp = perturb(g, s)
        (loss, comp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, gp)
        upd, opt_state = tx.update(grads, opt_state, params)
        upd = jax.tree.map(lambda u: u * jnp.float32(lr), upd)
        params = optax.apply_updates(params, upd)
        out = jnp.sum(comp)
        if metrics:
            m = inpainting_metrics(comp, gp, loss)
            out = out + sum(jnp.asarray(v, jnp.float32).sum()
                            for v in m.values())
        return out, params, opt_state

    stages = [
        ("fwd", jax.jit(stage_fwd)),
        ("grad", jax.jit(stage_grad)),
        ("grad+opt", jax.jit(lambda p, o, g, s: _opt(p, o, g, s, False))),
        ("grad+opt+metrics",
         jax.jit(lambda p, o, g, s: _opt(p, o, g, s, True))),
        ("grad+opt donated",
         jax.jit(lambda p, o, g, s: _opt(p, o, g, s, False),
                 donate_argnums=(0, 1))),
    ]

    def run_stage(name, fn, params, opt_state, graph):
        # AOT: lower+compile on ABSTRACT args first — compile-only backend
        # work never crashes the tunnel worker (bench_cost.py, clean
        # twice), while a fresh large compile followed immediately by its
        # first data dispatch is the crash class's signature (6/6 crashes
        # in the round-5 sessions, BENCH_NOTES). Splitting them also
        # lands the executable in the persistent cache even if the
        # dispatch below does crash, so a rerun starts warm.
        absd = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
            t)
        t0 = time.perf_counter()
        compiled = fn.lower(absd(params), absd(opt_state), absd(graph),
                            jax.ShapeDtypeStruct((), jnp.float32)).compile()
        compile_s = time.perf_counter() - t0
        fn = compiled
        p, o = params, opt_state
        s, p, o = fn(p, o, graph, jnp.float32(0.5))
        float(s)  # readback = hard sync through the tunnel
        s, p, o = fn(p, o, graph, s)
        float(s)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s, p, o = fn(p, o, graph, s)
        float(s)
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({
            "stage": name, "ms": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1), "V": V, "dtype": DTYPE,
            "windowed": WINDOWED,
            "scene": os.environ.get("BENCH_SCENE", "grid")}), flush=True)
        del p, o

    for name, fn in stages:
        run_stage(name, fn, params, opt_state, graph)

    # ---- norm ablation: same network, every norm layer removed ----------
    model_nn = dataclasses.replace(model, norm="none")
    params_nn = jax.device_put(
        jax.jit(model_nn.init)(jax.random.key(0), graph)["params"])
    opt_state_nn = jax.device_put(tx.init(params_nn))

    def loss_nn(p, g):
        out = model_nn.apply({"params": p}, g)
        loss, comp = inpainting_loss(out, g.color, g.mask, vmask, True)
        return loss, comp

    def stage_fwd_nn(params, opt_state, g, s):
        return jnp.sum(loss_nn(params, perturb(g, s))[1]), params, opt_state

    def stage_grad_nn(params, opt_state, g, s):
        (_, comp), grads = jax.value_and_grad(loss_nn, has_aux=True)(
            params, perturb(g, s))
        return jnp.sum(comp) + jax.tree.reduce(
            lambda a, b: a + jnp.sum(b), grads, 0.0), params, opt_state

    run_stage("fwd norm=none", jax.jit(stage_fwd_nn), params_nn,
              opt_state_nn, graph)
    run_stage("grad norm=none", jax.jit(stage_grad_nn), params_nn,
              opt_state_nn, graph)


if __name__ == "__main__":
    main()

"""Cold-compile + runtime benchmark of the flagship STINet under the ELL
slot-loop modes (STINET_ELL_MODE: unroll | fori | batched — ops/ell.py).

VERDICT r2 item 2: the f32 flagship cold-compile measured 300-1200 s on the
v5e because the unrolled ELL slot loops across ~17 blocks x fwd+bwd blow up
XLA:TPU program size. This script measures, with a FRESH compilation cache,
trace+lower time, compile time, and steady-state runtime for one
(mode, dtype, fwd|train) combination, printing ONE JSON line — so the
compile/runtime tradeoff of each mode is measured at the full model, not on
op microbenchmarks (Pallas adoption lesson: model-level numbers decide).

Env knobs: ELLC_MODE (default unroll), ELLC_DTYPE (float32), ELLC_WHAT
(fwd|train), BENCH_V (65536), ELLC_ITERS (20).
"""
import json
import os
import tempfile
import time

# fresh cache dir: cold-compile numbers, not cache hits
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="jax_coldcache_")
os.environ["STINET_ELL_MODE"] = os.environ.get("ELLC_MODE", "unroll")

import jax
import jax.numpy as jnp

V = int(os.environ.get("BENCH_V", 65536))
ITERS = int(os.environ.get("ELLC_ITERS", 20))
MODE = os.environ["STINET_ELL_MODE"]
DTYPE = os.environ.get("ELLC_DTYPE", "float32")
WHAT = os.environ.get("ELLC_WHAT", "fwd")


def main():
    import dataclasses
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    from stinet_tpu.utils.synthetic import synthetic_scene

    scene = synthetic_scene(num_vertices=V, levels=3, seed=0,
                            dilation_dists=(2, 4, 8, 16))
    graph = jax.device_put(build_hierarchical_graph([scene]))
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1], norm="instance",
                     pooling_type="max", n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv", dtype=DTYPE)
    params = jax.device_put(
        jax.jit(model.init)(jax.random.key(0), graph)["params"])

    if WHAT == "train":
        import optax
        from stinet_tpu.trainers.graph_common import (build_optimizer,
                                                      inpainting_loss)
        train_model = dataclasses.replace(model, remat_io_blocks=False)
        tx, lr = build_optimizer({"type": "Adam",
                                  "args": {"lr": 7e-5, "amsgrad": True}})
        opt_state = jax.device_put(tx.init(params))

        def step(params, opt_state, graph):
            def loss_fn(p):
                pred = train_model.apply({"params": p}, graph)
                vmask = graph.levels[0].vertex_mask()
                loss, comp = inpainting_loss(pred, graph.color, graph.mask,
                                             vmask, True)
                return loss, comp
            (loss, comp), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            upd = jax.tree.map(lambda u: u * jnp.float32(lr), upd)
            return optax.apply_updates(params, upd), opt_state, loss

        t0 = time.perf_counter()
        lowered = jax.jit(step).lower(params, opt_state, graph)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        params, opt_state, loss = compiled(params, opt_state, graph)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            params, opt_state, loss = compiled(params, opt_state, graph)
        float(loss)
        dt = (time.perf_counter() - t0) / ITERS
    else:
        def fwd(p, g):
            return model.apply({"params": p}, g)

        t0 = time.perf_counter()
        lowered = jax.jit(fwd).lower(params, graph)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        out = compiled(params, graph)
        float(jnp.sum(out))  # warm + hard sync (tunnel readback)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = compiled(params, graph)
            out = compiled(
                jax.tree.map(lambda x: x, params), graph)  # defeat caching
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / (2 * ITERS)

    print(json.dumps({
        "metric": "flagship_cold_compile_s", "mode": MODE, "dtype": DTYPE,
        "what": WHAT, "platform": jax.devices()[0].platform, "V": V,
        "lower_s": round(t_lower, 1), "compile_s": round(t_compile, 1),
        "run_ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()

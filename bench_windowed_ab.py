"""A/B: full-model bf16 forward, windowed build (RCM + banded ELL +
windowed one-hot kernels where dispatched) vs plain build (shuffled ids,
XLA row gather), on one scene family. Decides the windowed-dispatch halo
caps on real hardware at model level (memory lesson: op microbenchmarks
mislead — fusion boundaries and operand prep only show up in full-model
timings).

Prints one JSON line. Env: BENCH_SCENE (grid|sphere|terrain), BENCH_V,
BENCH_ITERS.
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


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from bench import build_scene
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G

    scene = build_scene()
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1],
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1, filter_type="edgeconvtransinv",
                     dtype="bfloat16")

    out = {"V": V, "scene": os.environ.get("BENCH_SCENE", "grid"),
           "dtype": "bfloat16", "iters": ITERS}

    for label, windowed in (("windowed_ms", True), ("plain_ms", False)):
        graph = jax.device_put(
            build_hierarchical_graph([scene], windowed=windowed))
        if windowed:
            out["halos"] = [
                None if lvl.edges.halo is None else int(lvl.edges.halo)
                for lvl in graph.levels]
            out["dilated_halos"] = [
                {int(d): (None if es.halo is None else int(es.halo))
                 for d, es in lvl.dilated.items()} for lvl in graph.levels]
        params = jax.device_put(
            jax.jit(model.init)(jax.random.key(0), graph)["params"])

        @jax.jit
        def chain(params, graph, prev):
            x = graph.x.at[:, 0:3].add(prev.astype(graph.x.dtype) * 1e-6)
            return model.apply({"params": params},
                               dataclasses.replace(graph, x=x))

        prev = jnp.zeros((graph.x.shape[0], 3), jnp.bfloat16)
        t0 = time.perf_counter()
        prev = chain(params, graph, prev)
        float(jnp.sum(prev.astype(jnp.float32)))  # readback = hard sync
        compile_s = time.perf_counter() - t0
        prev = chain(params, graph, prev)
        float(jnp.sum(prev.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            prev = chain(params, graph, prev)
        float(jnp.sum(prev.astype(jnp.float32)))
        out[label] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
        out[label.replace("_ms", "_compile_s")] = round(compile_s, 1)
        del graph, params, prev

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Compile-only XLA cost analysis of the flagship forward programs.

VERDICT r4 item 2: the f32-vs-bf16-windowed "bytes accessed" ratio is the
decisive number for the residual-traffic agenda (BENCH_NOTES.md, residual-
traffic analysis draft), and both round-4 attempts died to the tunnel's
worker-crash class AT THE FIRST FLAGSHIP DATA DISPATCH (BENCH_NOTES.md
round-4 crash log). This script therefore performs ZERO data dispatches:

  * params come from `jax.eval_shape(model.init, ...)` (abstract),
  * the graph is built on the host and converted to ShapeDtypeStructs,
  * `jax.jit(fwd).lower(abstract...).compile().cost_analysis()` only sends
    the program to the backend compiler — no buffers, no execution.

If the worker-crash trigger is the flagship EXECUTION (the round-4
evidence: init dispatch fine, first chain sync fatal), compile-only runs
cannot trip it. One JSON line per program, flushed.

Usage: python bench_cost.py  [BENCH_V=65536]
"""
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V = int(os.environ.get("BENCH_V", 65536))
NGF, N_BLOCKS = 64, 9
DILATIONS = [1, 1, 1, 2, 4, 8, 16, 1, 1]
T0 = time.time()


def main():
    import jax

    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    from stinet_tpu.utils.synthetic import synthetic_scene

    print(f"[cost {time.time() - T0:5.1f}s] platform="
          f"{jax.devices()[0].platform}", file=sys.stderr, flush=True)
    scene = synthetic_scene(num_vertices=V, levels=3, seed=0,
                            dilation_dists=(2, 4, 8, 16))

    def make_model(dtype):
        return define_G(input_nc=10, output_nc=3, ngf=NGF,
                        n_blocks=N_BLOCKS, dilations=DILATIONS,
                        norm="instance", pooling_type="max", n_levels=2,
                        n_repeated_io_convs=1,
                        filter_type="edgeconvtransinv", dtype=dtype)

    def abstract(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)

    def cost_of(tag, dtype, windowed):
        graph = build_hierarchical_graph([scene], windowed=windowed)
        g_abs = abstract(graph)
        model = make_model(dtype)
        p_abs = jax.eval_shape(model.init, jax.random.key(0),
                               g_abs)["params"]

        def fwd(p, g):
            return model.apply({"params": p}, g)

        t0 = time.time()
        compiled = jax.jit(fwd).lower(p_abs, g_abs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        row = {"program": tag, "compile_s": round(time.time() - t0, 1)}
        for k in ("flops", "bytes accessed", "bytes accessed output",
                  "optimal_seconds", "utilization operand 0 {}",
                  "bytes accessed operand 0 {}"):
            if ca and k in ca:
                row[k.replace(" ", "_")] = float(ca[k])
        if ca:
            # total of all "bytes accessed operand N" keys, if present
            op_bytes = sum(v for k, v in ca.items()
                           if k.startswith("bytes accessed operand"))
            if op_bytes:
                row["bytes_accessed_operands_total"] = float(op_bytes)
        row["n_cost_keys"] = len(ca) if ca else 0
        print(json.dumps(row), flush=True)
        return ca

    for tag, dtype, windowed in (("flagship_f32", "float32", False),
                                 ("bf16_windowed", "bfloat16", True),
                                 ("f32_windowed", "float32", True)):
        try:
            cost_of(tag, dtype, windowed)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(json.dumps({"program": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()

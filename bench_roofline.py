"""Roofline accounting for the flagship STINet forward (one scene).

Lowers the jitted forward at the bench shape and prints XLA's own cost
analysis (FLOPs, bytes accessed) plus derived speed-of-light times against
TPU v5e peaks, so the measured ms/scene can be judged against the
hardware ceiling rather than against torch. Platform-independent: the
FLOP/byte counts come from the lowered HLO (run with BENCH_PLATFORM=cpu
off-TPU; the numbers describe the same program XLA compiles for TPU).

v5e peaks (public): 197 TFLOP/s bf16 MXU, 819 GB/s HBM, 16 GB HBM.

Prints one JSON line. Env: BENCH_V, BENCH_DTYPE, BENCH_WINDOWED,
BENCH_SCENE as in bench.py / bench_train_breakdown.py.
"""
import json
import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

V = int(os.environ.get("BENCH_V", 65536))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
WINDOWED = os.environ.get("BENCH_WINDOWED", "0") == "1"

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from bench import build_scene
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G

    scene = build_scene()
    graph = build_hierarchical_graph([scene], windowed=WINDOWED)
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1],
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1, filter_type="edgeconvtransinv",
                     dtype=DTYPE)
    params = jax.jit(model.init)(jax.random.key(0), graph)["params"]

    compiled = (jax.jit(lambda p, g: model.apply({"params": p}, g))
                .lower(params, graph).compile())
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    n_params = sum(x.size for x in jax.tree.leaves(params))
    out = {
        "V": V, "dtype": DTYPE, "windowed": WINDOWED,
        "scene": os.environ.get("BENCH_SCENE", "grid"),
        "params": int(n_params),
        "xla_flops_per_scene": flops,
        "xla_bytes_accessed_per_scene": bytes_accessed,
        "sol_compute_ms_bf16_peak": round(flops / V5E_BF16_FLOPS * 1e3, 3),
        "sol_hbm_ms": round(bytes_accessed / V5E_HBM_BPS * 1e3, 3),
        "arithmetic_intensity_flops_per_byte": round(
            flops / max(bytes_accessed, 1.0), 2),
        "note": "bytes-accessed is XLA's sum over HLO operands/outputs "
                "(upper bound on true HBM traffic: fused temporaries never "
                "materialize); FLOPs counts matmul/elementwise HLO ops",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

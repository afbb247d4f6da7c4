"""Production-serving demo, no external data needed: wrap a flagship
STINet (untrained weights) in `SceneInpainter` and drive the three serving
modes over a stream of synthetic scenes —

  * single-scene `predict` (the latency path),
  * `predict_batch(stacked="auto")` (vmapped per-scene tables; pass a
    `--mesh N` to shard scenes across N devices),
  * `predict_stream` (ordered streaming, threaded host builds overlapped
    with device dispatch — serving is host-bound, see
    stinet_tpu/serving.py docstring).

    python examples/serve_scenes.py [--vertices 8192] [--scenes 6]
    python examples/serve_scenes.py --mesh 4 --cpu   # needs >=4 devices

In production you would construct the server from a trained checkpoint:
    SceneInpainter.from_checkpoint("saved/.../model_best.ckpt", scene)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=8192)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard stacked batches over this many devices")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu and args.mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.mesh}").strip()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    from stinet_tpu.serving import SceneInpainter
    from stinet_tpu.utils.synthetic import synthetic_scene

    scenes = [synthetic_scene(num_vertices=args.vertices, levels=3, seed=s)
              for s in range(args.scenes)]
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1],
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1, filter_type="edgeconvtransinv")
    params = jax.jit(model.init)(
        jax.random.key(0), build_hierarchical_graph(scenes[:1]))["params"]

    mesh = None
    if args.mesh:
        from stinet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
    server = SceneInpainter(model, params, mesh=mesh)

    print("warmup (pays all compiles)...")
    server.warmup(scenes[:4], batch_sizes=(1, 4))   # the sizes served below
    print(f"compiled signatures: {server.num_compiles()}")

    t0 = time.perf_counter()
    out = server.predict(scenes[0])
    print(f"predict: {out.shape} in {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    outs = server.predict_batch(scenes[:4], stacked="auto")
    print(f"predict_batch B=4 (stacked): {len(outs)} scenes in "
          f"{time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    n = sum(1 for _ in server.predict_stream(iter(scenes), build_workers=3))
    dt = time.perf_counter() - t0
    print(f"predict_stream: {n} scenes in {dt:.3f}s "
          f"({n / dt:.2f} scenes/s, host-build-bound)")

    if mesh is not None:
        t0 = time.perf_counter()
        out = server.predict_partitioned(scenes[0])
        print(f"predict_partitioned (1 scene over {args.mesh} devices, "
              f"ring halo exchanges): {out.shape} in "
              f"{time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()

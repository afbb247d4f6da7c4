"""End-to-end demo, no external data needed: synthesize a ScanNet-like
scene, mask a region, run the flagship STINet (untrained weights), and dump
colored PLYs of input/prediction for inspection.

    python examples/inpaint_synthetic_scene.py [--vertices 16384]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=16384)
    ap.add_argument("--out", default="visualizations/demo")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    from stinet_tpu.utils.synthetic import synthetic_scene
    from stinet_tpu.utils.visualization import _write_ply

    scene = synthetic_scene(num_vertices=args.vertices, levels=3, seed=0)
    graph = build_hierarchical_graph([scene])
    model = define_G(input_nc=10, output_nc=3, ngf=64, n_blocks=9,
                     dilations=[1, 1, 1, 2, 4, 8, 16, 1, 1],
                     norm="instance", pooling_type="max", n_levels=2,
                     n_repeated_io_convs=1, filter_type="edgeconvtransinv")
    params = jax.jit(model.init)(jax.random.key(0), graph)["params"]
    out = jax.jit(lambda p, g: model.apply({"params": p}, g))(params, graph)

    n = int(graph.levels[0].num_vertices)
    pred = np.asarray(out)[:n] / 2.0 + 0.5
    color = np.asarray(graph.color)[:n] / 2.0 + 0.5
    mask = np.asarray(graph.mask)[:n, 0] > 0
    pos = scene.x[:, 6:9]
    masked = color.copy()
    masked[mask] = [0.1, 0.9, 0.1]

    os.makedirs(args.out, exist_ok=True)
    for tag, c in (("input", masked), ("pred", pred), ("gt", color)):
        path = os.path.join(args.out, f"scene_{tag}.ply")
        _write_ply(path, pos, c)
        print("wrote", path)
    print(f"{n} vertices; masked fraction "
          f"{mask.mean():.2%}; prediction range "
          f"[{pred.min():.3f}, {pred.max():.3f}]")


if __name__ == "__main__":
    main()

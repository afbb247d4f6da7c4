"""Per-phase breakdown of SceneInpainter.predict_stream (VERDICT r4 item 1).

Round 4 measured 751.7 ms/scene end-to-end against a serving-economics story
of ~27 ms host build + ~8 ms device forward. This script decomposes one
streamed scene into its phases on live hardware:

  build      raw -> padded HierarchicalGraph (host, native C++ builder)
  normalize  running-max width ratchet (host, numpy pad)
  h2d        jax.device_put of the graph pytree (leaf count + bytes printed)
  dispatch   _fwd call returning (async)
  d2h        np.asarray of the valid-vertex output slice (hard sync)

then times the CURRENT predict_stream and a PIPELINED variant over N scenes.

Usage: python bench_stream_phases.py [N_SCENES]   (default 8, grid V=65536)
"""
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

V = int(os.environ.get("BENCH_V", 65536))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NGF, N_BLOCKS = 64, 9
DILATIONS = [1, 1, 1, 2, 4, 8, 16, 1, 1]


def main():
    import jax
    import jax.numpy as jnp
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.models.factory import define_G
    from stinet_tpu.serving import SceneInpainter
    from stinet_tpu.utils.synthetic import synthetic_scene

    print(f"platform={jax.devices()[0].platform}", file=sys.stderr)
    scenes = [synthetic_scene(num_vertices=V, levels=3, seed=100 + i,
                              dilation_dists=(2, 4, 8, 16))
              for i in range(N)]
    model = define_G(input_nc=10, output_nc=3, ngf=NGF, n_blocks=N_BLOCKS,
                     dilations=DILATIONS, norm="instance", pooling_type="max",
                     n_levels=2, n_repeated_io_convs=1,
                     filter_type="edgeconvtransinv", dtype="float32")
    g0 = jax.device_put(build_hierarchical_graph([scenes[0]]))
    params = jax.device_put(
        jax.jit(model.init)(jax.random.key(0), g0)["params"])
    server = SceneInpainter(model, params, geometric=False)

    t0 = time.time()
    server.warmup(scenes)
    print(f"warmup: {time.time() - t0:.1f}s compiles={server.num_compiles()}",
          file=sys.stderr)

    # ---- phase breakdown, per scene (post-warmup steady state) ----
    rows = []
    for s in scenes:
        t = {}
        t0 = time.perf_counter()
        graph = build_hierarchical_graph(
            [s], pad_multiple=server.pad_multiple, geometric=False,
            windowed=False)
        t["build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        graph = server._normalize_widths(graph)
        t["normalize"] = time.perf_counter() - t0

        leaves = jax.tree_util.tree_leaves(graph)
        nbytes = sum(x.nbytes for x in leaves)
        t0 = time.perf_counter()
        graph = jax.device_put(graph)
        # force completion of every transfer
        for x in jax.tree_util.tree_leaves(graph):
            x.block_until_ready()
        t["h2d"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = server._fwd(server.params, graph)
        t["dispatch"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = np.asarray(out[:s.num_vertices[0]])
        t["d2h"] = time.perf_counter() - t0
        t["n_leaves"] = len(leaves)
        t["mbytes"] = round(nbytes / 1e6, 1)
        rows.append(t)
        del res

    med = {k: round(1e3 * float(np.median([r[k] for r in rows])), 1)
           for k in ("build", "normalize", "h2d", "dispatch", "d2h")}
    med["n_leaves"] = rows[0]["n_leaves"]
    med["mbytes"] = rows[0]["mbytes"]
    med["sum_ms"] = round(sum(med[k] for k in
                              ("build", "normalize", "h2d", "dispatch",
                               "d2h")), 1)
    print(json.dumps({"phase_breakdown_median_ms": med}), flush=True)

    # ---- h2d sub-experiment: is it per-leaf RTT or bandwidth? ----
    graph_h = server._normalize_widths(build_hierarchical_graph(
        [scenes[0]], pad_multiple=server.pad_multiple, geometric=False))
    leaves, treedef = jax.tree_util.tree_flatten(graph_h)
    nbytes = sum(x.nbytes for x in leaves)
    # (a) one big buffer of the same total size
    big = np.zeros(nbytes // 4 + 1, np.float32)
    for tag, payload in (("single_big_buffer", [big]),
                         ("per_leaf", leaves)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            dev = [jax.device_put(x) for x in payload]
            for x in dev:
                x.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del dev
        print(json.dumps({f"h2d_{tag}_ms": round(1e3 * min(ts), 1),
                          "n": len(payload),
                          "mbytes": round(nbytes / 1e6, 1)}), flush=True)
    # (b) batched device_put of the whole list at once
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(leaves)
        for x in dev:
            x.block_until_ready()
        ts.append(time.perf_counter() - t0)
        del dev
    print(json.dumps({"h2d_batched_list_ms": round(1e3 * min(ts), 1)}),
          flush=True)

    # (c) packed single-buffer path (transfer.py): pack on host, one put,
    # jitted unpack
    from stinet_tpu.transfer import pack_pytree, unpack_on_device
    buf, spec = pack_pytree(graph_h)
    g_dev = unpack_on_device(jax.device_put(buf), spec)  # compile unpack
    jax.block_until_ready(g_dev)
    ts_pack, ts_put = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        buf, spec = pack_pytree(graph_h)
        ts_pack.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        g_dev = unpack_on_device(jax.device_put(buf), spec)
        jax.block_until_ready(g_dev)
        ts_put.append(time.perf_counter() - t0)
    print(json.dumps({"pack_host_ms": round(1e3 * min(ts_pack), 1),
                      "h2d_packed_put_unpack_ms":
                          round(1e3 * min(ts_put), 1),
                      "packed_mbytes": round(buf.nbytes / 1e6, 1)}),
          flush=True)

    # (d) packed + liveness-stripped (what predict_stream actually sends)
    live = server._live_for(graph_h)
    buf_l, spec_l = pack_pytree(graph_h, live=live)
    g_dev = unpack_on_device(jax.device_put(buf_l), spec_l)
    jax.block_until_ready(g_dev)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        buf_l, spec_l = pack_pytree(graph_h, live=live)
        g_dev = unpack_on_device(jax.device_put(buf_l), spec_l)
        jax.block_until_ready(g_dev)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"h2d_live_packed_total_ms": round(1e3 * min(ts), 1),
                      "live_mbytes": round(buf_l.nbytes / 1e6, 1),
                      "live_leaves": int(sum(live)),
                      "dead_leaves": int(len(live) - sum(live))}),
          flush=True)

    # ---- current predict_stream ----
    t0 = time.perf_counter()
    n_done = sum(1 for _ in server.predict_stream(iter(scenes)))
    cur = (time.perf_counter() - t0) / n_done
    print(json.dumps({"stream_current_ms_per_scene": round(1e3 * cur, 1),
                      "scenes": n_done}), flush=True)

    # ---- d2h sub-experiment: sync readback cost of the output alone ----
    out = server._fwd(server.params, jax.device_put(graph_h))
    np.asarray(out)
    ts = []
    for _ in range(5):
        out = server._fwd(server.params, jax.device_put(graph_h))
        t0 = time.perf_counter()
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"d2h_out_sync_ms": round(1e3 * min(ts), 1),
                      "out_mbytes": round(out.nbytes / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()

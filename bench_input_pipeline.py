"""Per-step batch H2D cost: per-leaf device_put vs packed transfer.

The flagship bench keeps its graph RESIDENT, so it never shows the cost a
real training loop pays every step: moving the freshly assembled padded
batch (~77 leaves) host->device. trainers/graph_common.py:place_* now
routes the single-device path through the packed transfer with
compress_indices=False (pure host-side concatenation); this script
measures what that buys on live hardware:

  per_leaf     jax.device_put(graph)            (the old path)
  packed_raw   device_put_packed(compress=False) (the new trainer path)
  packed_comp  device_put_packed(compress=True)  (the serving wire path)

Each timed WITH a blocking sync so the transfer cost is fully counted.
One JSON line per variant. Env: BENCH_V (default 65536), BENCH_ITERS
(default 10).
"""
import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V = int(os.environ.get("BENCH_V", 65536))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # tiny first dispatch absorbs tunnel recovery (BENCH_NOTES round 5)
    float(jnp.sum(jnp.ones((2, 2)) @ jnp.ones((2, 2))))

    from bench import build_scene_of
    from stinet_tpu.graph.build import build_hierarchical_graph
    from stinet_tpu.transfer import device_put_packed

    graph = build_hierarchical_graph([build_scene_of("grid", 0)])
    leaves = jax.tree_util.tree_leaves(graph)
    mbytes = sum(x.nbytes for x in leaves) / 1e6

    @jax.jit
    def consume(tree):
        # touch every leaf with one tiny program -> ONE host sync. A
        # per-leaf block_until_ready costs one tunnel round-trip PER LEAF
        # (~26 ms x 77 = 2 s — the first version of this script measured
        # exactly that artifact on every variant); a real train step
        # consumes the whole tree in one dispatch, so this is the honest
        # completion fence.
        return sum(jnp.ravel(x)[:1].astype(jnp.float32).sum()
                   for x in jax.tree_util.tree_leaves(tree))

    def sync(tree):
        float(consume(tree))

    variants = [
        ("per_leaf", lambda: jax.device_put(graph)),
        ("packed_raw", lambda: device_put_packed(graph,
                                                 compress_indices=False)),
        ("packed_comp", lambda: device_put_packed(graph,
                                                  compress_indices=True)),
    ]
    for name, put in variants:
        sync(put())  # warm (unpack/consume program compiles)
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            sync(put())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(json.dumps({
            "variant": name, "ms_min": round(1e3 * ts[0], 2),
            "ms_median": round(1e3 * ts[len(ts) // 2], 2),
            "n_leaves": len(leaves), "mbytes": round(mbytes, 1),
            "platform": jax.devices()[0].platform}), flush=True)


if __name__ == "__main__":
    main()

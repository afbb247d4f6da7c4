"""Tunnel H2D microbenchmark: fixed RTT vs bandwidth, and transfer overlap.

Fits t(size) over single-buffer device_puts, then checks whether two
concurrent transfers from separate threads overlap or serialize.
"""
import concurrent.futures
import json
import time

import jax
import numpy as np


def put_sync(x):
    d = jax.device_put(x)
    d.block_until_ready()
    return d


def timed_put(x, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        d = put_sync(x)
        ts.append(time.perf_counter() - t0)
        del d
    return min(ts)


def main():
    print(f"platform={jax.devices()[0].platform}")
    put_sync(np.zeros(8, np.float32))  # wake the tunnel

    sizes_mb = [0.01, 0.1, 1, 5, 20, 80]
    pts = []
    for mb in sizes_mb:
        x = np.random.rand(int(mb * 1e6 / 4)).astype(np.float32)
        dt = timed_put(x)
        pts.append((mb, dt))
        print(json.dumps({"mb": mb, "ms": round(dt * 1e3, 1),
                          "mbps": round(mb / dt, 1)}), flush=True)
    # least squares fit t = a + b*size
    A = np.array([[1.0, mb] for mb, _ in pts])
    y = np.array([dt for _, dt in pts])
    a, b = np.linalg.lstsq(A, y, rcond=None)[0]
    print(json.dumps({"fixed_ms": round(a * 1e3, 1),
                      "bandwidth_mbps": round(1 / b, 1)}), flush=True)

    # concurrency: two 20MB transfers from two threads
    x1 = np.random.rand(5_000_000).astype(np.float32)
    x2 = np.random.rand(5_000_000).astype(np.float32)
    t_seq = timed_put(x1) + timed_put(x2)
    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        t0 = time.perf_counter()
        list(ex.map(put_sync, [x1, x2]))
        t_par = time.perf_counter() - t0
        t0 = time.perf_counter()
        list(ex.map(put_sync, [x1, x2]))
        t_par = min(t_par, time.perf_counter() - t0)
    print(json.dumps({"two_20mb_sequential_ms": round(t_seq * 1e3, 1),
                      "two_20mb_threads_ms": round(t_par * 1e3, 1)}),
          flush=True)

    # does device_put return before the transfer completes (async h2d)?
    t0 = time.perf_counter()
    d = jax.device_put(x1)
    t_submit = time.perf_counter() - t0
    d.block_until_ready()
    t_total = time.perf_counter() - t0
    print(json.dumps({"submit_ms": round(t_submit * 1e3, 1),
                      "total_ms": round(t_total * 1e3, 1)}), flush=True)

    # d2h: pure readback of a resident 20MB device buffer
    for mb, dd in ((20, d), (0.8, put_sync(np.zeros(200_000, np.float32)))):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(dd)
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"d2h_mb": mb, "ms": round(min(ts) * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark: Pallas DMA-pipeline gather vs the XLA unrolled ELL path,
on real TPU hardware (run when the axon tunnel is alive). Prints one JSON
line per shape; results go into ops/pallas/README.md either way
(VERDICT r1 item 3).

Also times the opt-in Pallas instance norm vs the XLA masked_instance_norm
(graduating it from interpret-mode-only validation)."""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))  # device->host readback = hard sync on axon


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from stinet_tpu.ops.ell import ell_edge_conv_sum
    from stinet_tpu.ops.pallas.gather_pipeline import pallas_ell_edge_conv_sum

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    shapes = [
        # (V, H, D) — level-0 io blocks, encoder level-1, bottleneck level-2
        (65536, 128, 12),
        (19712, 256, 12),
        (6016, 512, 16),
    ]
    results = []
    for v, h, d in shapes:
        v_pad = -(-v // 512) * 512
        p = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
        deg = jnp.asarray(
            rng.integers(4, d + 1, size=v_pad).astype(np.float32))
        nbr = jnp.asarray(rng.integers(0, v_pad, size=(v_pad, d))
                          .astype(np.int32))
        rev = jnp.asarray(rng.integers(0, v_pad, size=(v_pad, d))
                          .astype(np.int32))

        xla = jax.jit(lambda p, q: ell_edge_conv_sum(p, q, nbr, rev, deg,
                                                     deg))
        t_xla = time_fn(xla, p, q)

        row = {"shape": [v_pad, h, d], "xla_ms": round(t_xla * 1e3, 3)}
        for tile in (128, 256, 512):
            try:
                pk = jax.jit(lambda p, q, t=tile: pallas_ell_edge_conv_sum(
                    p, q, nbr, deg, tile=t))
                t_pal = time_fn(pk, p, q)
                # correctness spot check on hardware
                a = np.asarray(pk(p, q))
                b = np.asarray(xla(p, q))
                ok = bool(np.allclose(a, b, rtol=1e-4, atol=1e-4))
                row[f"pallas_t{tile}_ms"] = round(t_pal * 1e3, 3)
                row[f"pallas_t{tile}_ok"] = ok
            except Exception as e:  # compile failures are a result too
                row[f"pallas_t{tile}_error"] = str(e)[-200:]
        results.append(row)
        print(json.dumps({"bench": "ell_gather", "platform": platform,
                          **row}))

    # windowed one-hot MXU kernel (the ADOPTED bf16 path): op-level fwd and
    # fwd+bwd vs the XLA row gather on a banded graph at the flagship shape
    try:
        from stinet_tpu.ops.pallas.onehot_gather import (
            windowed_ell_edge_conv_sum)
        for v, h, d, halo in ((65536, 128, 12, 512), (16384, 256, 12, 512),
                              (6144, 512, 16, 512), (65536, 128, 6, 256),
                              (19712, 256, 6, 256)):
            p16 = jnp.asarray(rng.normal(size=(v, h))).astype(jnp.bfloat16)
            q16 = jnp.asarray(rng.normal(size=(v, h))).astype(jnp.bfloat16)
            base = np.arange(v)
            nbr = jnp.asarray(
                np.clip(base[:, None] + rng.integers(-halo, halo + 1,
                                                     size=(v, d)),
                        0, v - 1).astype(np.int32))
            rev = jnp.asarray(
                np.clip(base[:, None] + rng.integers(-halo, halo + 1,
                                                     size=(v, d)),
                        0, v - 1).astype(np.int32))
            deg = jnp.asarray(rng.integers(4, d + 1, size=v)
                              .astype(np.float32))

            xla_f = jax.jit(lambda p, q: ell_edge_conv_sum(
                p, q, nbr, rev, deg, deg))
            win_f = jax.jit(lambda p, q: windowed_ell_edge_conv_sum(
                halo, 256, False, p, q, nbr, rev, deg, deg))

            def loss(f):
                return jax.jit(jax.grad(
                    lambda p, q: jnp.sum(f(p, q).astype(jnp.float32) ** 2),
                    argnums=(0, 1)))

            row = {"shape": [v, h, d], "halo": halo,
                   "xla_fwd_ms": round(time_fn(xla_f, p16, q16) * 1e3, 3),
                   "win_fwd_ms": round(time_fn(win_f, p16, q16) * 1e3, 3)}
            gx = loss(lambda p, q: ell_edge_conv_sum(p, q, nbr, rev, deg,
                                                     deg))
            gw = loss(lambda p, q: windowed_ell_edge_conv_sum(
                halo, 256, False, p, q, nbr, rev, deg, deg))
            row["xla_fwdbwd_ms"] = round(
                time_fn(lambda p, q: gx(p, q)[0], p16, q16) * 1e3, 3)
            row["win_fwdbwd_ms"] = round(
                time_fn(lambda p, q: gw(p, q)[0], p16, q16) * 1e3, 3)
            a = np.asarray(win_f(p16, q16), np.float32)
            b = np.asarray(xla_f(p16, q16), np.float32)
            row["ok"] = bool(np.sqrt(((a - b) ** 2).mean())
                             / max(np.sqrt((b ** 2).mean()), 1e-9) < 0.01)
            print(json.dumps({"bench": "windowed_onehot",
                              "platform": platform, **row}))
    except Exception as e:
        print(json.dumps({"bench": "windowed_onehot",
                          "error": str(e)[-300:]}))

    # exact-f32 windowed kernel (bf16x3 planes) vs the XLA f32 row gather —
    # the headline-dtype candidate: forward must be bit-identical
    try:
        from stinet_tpu.ops.pallas.onehot_gather import (
            windowed_ell_edge_conv_sum_f32)
        for v, h, d, halo in ((65536, 128, 6, 256), (19712, 256, 6, 256),
                              (6144, 512, 9, 256), (65536, 128, 12, 512)):
            p32 = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
            q32 = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
            base = np.arange(v)
            nbr = jnp.asarray(
                np.clip(base[:, None] + rng.integers(-halo, halo + 1,
                                                     size=(v, d)),
                        0, v - 1).astype(np.int32))
            rev = jnp.asarray(
                np.clip(base[:, None] + rng.integers(-halo, halo + 1,
                                                     size=(v, d)),
                        0, v - 1).astype(np.int32))
            deg = jnp.asarray(rng.integers(4, d + 1, size=v)
                              .astype(np.float32))
            xla_f = jax.jit(lambda p, q: ell_edge_conv_sum(
                p, q, nbr, rev, deg, deg))
            win_f = jax.jit(lambda p, q: windowed_ell_edge_conv_sum_f32(
                halo, 256, False, p, q, nbr, rev, deg, deg))
            row = {"shape": [v, h, d], "halo": halo,
                   "xla_fwd_ms": round(time_fn(xla_f, p32, q32) * 1e3, 3),
                   "win_fwd_ms": round(time_fn(win_f, p32, q32) * 1e3, 3)}
            a = np.asarray(win_f(p32, q32))
            b = np.asarray(xla_f(p32, q32))
            row["bit_exact"] = bool((a == b).all())
            print(json.dumps({"bench": "windowed_onehot_f32",
                              "platform": platform, **row}))
    except Exception as e:
        print(json.dumps({"bench": "windowed_onehot_f32",
                          "error": str(e)[-300:]}))

    # instance norm: pallas two-pass kernel vs XLA masked norm
    try:
        from stinet_tpu.ops.pallas.instance_norm import pallas_instance_norm
        from stinet_tpu.ops.norms import masked_instance_norm
        v_pad, h = 65536, 128
        x = jnp.asarray(rng.normal(size=(v_pad, h)).astype(np.float32))
        nv = jnp.int32(v_pad - 100)
        gid = jnp.zeros(v_pad, jnp.int32)
        from stinet_tpu.ops.message_passing import length_mask
        vm = length_mask(nv, v_pad)
        t_x = time_fn(jax.jit(
            lambda x: masked_instance_norm(x, gid, 1, vm)), x)
        t_p = time_fn(jax.jit(
            lambda x: pallas_instance_norm(x, nv)), x)
        a = np.asarray(jax.jit(lambda x: pallas_instance_norm(x, nv))(x))
        b = np.asarray(jax.jit(
            lambda x: masked_instance_norm(x, gid, 1, vm))(x))
        print(json.dumps({
            "bench": "instance_norm", "platform": platform,
            "xla_ms": round(t_x * 1e3, 3), "pallas_ms": round(t_p * 1e3, 3),
            "ok": bool(np.allclose(a, b, rtol=1e-4, atol=1e-4))}))
    except Exception as e:
        print(json.dumps({"bench": "instance_norm",
                          "error": str(e)[-200:]}))


if __name__ == "__main__":
    main()

"""Windowed one-hot MXU edge-conv aggregation (Pallas).

The XLA row-gather path (ops/ell.py) is bound by DRAM row transactions:
~256-512 B rows gather at ~30% of HBM peak, and bf16 rows buy only ~9%
because the transaction COUNT, not the byte count, is the wall (measured:
bench_pallas.py / BENCH_NOTES round 2). This kernel removes row
transactions entirely for bandwidth-ordered graphs:

  * vertices are ordered so every edge satisfies |src - dst| <= halo
    (reverse-Cuthill-McKee does this for mesh graphs; violating edges go
    to the COO spill path exactly like high-degree spill);
  * each receiver tile [T rows] then finds ALL its senders inside a
    contiguous window q[w0 : w0+W], W = T + 2*halo, which streams from
    HBM as one large coalesced DMA (double-buffered across grid steps);
  * per slot d the gather becomes onehot([T, W]) @ window([W, H]) on the
    MXU in bf16 — one-hot rows select exact bf16 values (products are 0
    or the value itself; one term per row), so the result is EXACTLY the
    gathered row, accumulated in f32.

Cost model at the flagship level-0 shape (V=65k, H=128, D=12, W=768,
bf16): 155 GFLOP -> ~0.8 ms at v5e peak vs ~1.5-3 ms for the row gather;
window traffic is ~37 MB vs ~400 MB of random rows.

Forward semantics match ops/ell.py::_forward:

    out[v] = sum_d 1[d < deg[v]] * relu(p[v] + q[nbr[v, d]])

bit-for-bit up to one caveat: when the f32 slot sum lands EXACTLY halfway
between two bf16 neighbors, the final f32->bf16 cast may break the tie
differently than XLA's (1 ulp; ~0.1% of elements on random inputs).

Requires: V % tile == 0, all nbr within the clamped window (the graph
builder guarantees it; tests assert it), H % 128 == 0, W % 8 == 0.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _windowed_dma(q_hbm, win, sems, w0_of, pipelined, i, n):
    """Window staging policy shared by all three kernels. Returns the VMEM
    slot holding the current grid step's window. `win`/`sems` are
    pallas_call scratch (persist across sequential TPU grid steps)."""

    def win_dma(slot, j):
        w = win.shape[1]
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(w0_of(j), w), :], win.at[slot], sems.at[slot])

    if pipelined:
        # step i waits for the window started at step i-1 (or its own at
        # i == 0) and prefetches window i+1 behind the compute; TPU grid
        # steps run sequentially on one core and share scratch + in-flight
        # DMAs
        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            win_dma(0, 0).start()

        win_dma(slot, i).wait()

        @pl.when(i + 1 < n)
        def _():
            win_dma(1 - slot, i + 1).start()
    else:
        # the interpreter resets scratch state per grid step: block instead
        slot = 0
        dma = win_dma(0, i)
        dma.start()
        dma.wait()
    return slot


def slot_chunk(tile: int) -> int:
    """Slots folded per one-hot matmul: M = chunk*tile ~ 1024 keeps the
    MXU full (per-slot matmuls are latency-bound: measured 4.2 ms vs the
    2.3 ms fused form at the flagship shape) while bounding the VMEM-
    resident one-hot/rows buffers."""
    return max(1, 1024 // tile)


def _onehot_rows(nbr_local, window, tile, w, d_slots):
    """Gather rows window[nbr_local[d, t]] for a CHUNK of slots as one
    [chunk*T, W] @ [W, H'] matmul; the slot axis is folded into M via
    sublane concat (Mosaic has no cross-lane reshape)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
    onehot = jnp.concatenate(
        [(nbr_local[d, :][:, None] == col).astype(jnp.bfloat16)
         for d in range(d_slots)], axis=0)
    return jnp.dot(onehot, window, preferred_element_type=jnp.float32)


def _kernel(nbr_t_ref, deg_ref, p_ref, q_hbm, out_ref, win, sems, *,
            tile, d_slots, h, w, halo, v, pipelined, mode, planes=1):
    """Grid step i: stream window q[w0:w0+W], one one-hot matmul, reduce.

    mode='relu': out[v] = sum_d 1[d<deg] relu(p[v] + q[nbr])      (forward)
    mode='step': out[v] = sum_d 1[d<deg] step(p[v] + q[nbr])      (dp / g)

    planes=1: bf16 rows (q_hbm is [V, H] bf16; p + q added in bf16 to
    match the XLA bf16 path's compute dtype).
    planes=3: EXACT f32 rows via the bf16x3 split (q_hbm is [V, 3H]: the
    hi/mid/lo bf16 planes of an f32 q). Each one-hot matmul returns the
    three planes in f32; (hi + mid) + lo reconstructs the original f32
    value exactly (hi+mid needs <=17 mantissa bits, the full sum is the
    representable original, and f32 adds round correctly), so the slot
    math below is bit-identical to ops/ell.py's f32 path.
    """
    i = pl.program_id(0)

    def w0_of(j):
        # halo, tile, w, v are all multiples of 32 (wrapper guarantees), so
        # every clipped start is 32-aligned — hint it so Mosaic accepts the
        # dynamic HBM slice under the bf16 (8,128)(2,1) tiling
        return pl.multiple_of(jnp.clip(j * tile - halo, 0, v - w), 32)

    n = pl.num_programs(0)

    # win/sems arrive via pallas_call scratch_shapes: the documented
    # mechanism for VMEM state (the double-buffered window + its DMA
    # semaphores) persisting across sequential TPU grid steps
    slot = _windowed_dma(q_hbm, win, sems, w0_of, pipelined, i, n)
    w0 = w0_of(i)
    nbr_local = nbr_t_ref[...] - w0  # [d_pad, tile], window-relative
    deg = deg_ref[...].astype(jnp.int32)  # [tile, 1]
    p_loc = p_ref[...]

    acc = jnp.zeros((tile, h), jnp.float32)
    ch = slot_chunk(tile)
    for c0 in range(0, d_slots, ch):
        cs = min(ch, d_slots - c0)
        rows = _onehot_rows(nbr_local[c0:c0 + cs], win[slot], tile, w,
                            cs)
        for k in range(cs):
            d = c0 + k
            r = rows[k * tile:(k + 1) * tile]
            if planes == 1:
                # p + q added in bf16 to match ops/ell.py's compute
                # dtype bit-for-bit (rows are exact bf16 values in
                # f32); accumulation stays f32, same slot order.
                # compare/relu in f32 (exact on upcast bf16): Mosaic
                # has no bf16 vector cmpf lowering
                z32 = (p_loc + r.astype(jnp.bfloat16)).astype(
                    jnp.float32)
            else:
                q_row = (r[:, :h] + r[:, h:2 * h]) + r[:, 2 * h:]
                z32 = p_loc.astype(jnp.float32) + q_row
            m = (jax.nn.relu(z32) if mode == "relu"
                 else (z32 > 0).astype(jnp.float32))
            acc = acc + jnp.where(d < deg, m, 0.0)

    out_ref[...] = acc.astype(out_ref.dtype)


def _kernel_dq(rev_t_ref, deg_ref, q_ref, gp_hbm, out_ref, win, sems, *,
               tile, d_slots, h, w, halo, v, pipelined):
    """dq[s] = sum_j 1[j<deg_out] g[r_j] * step(p[r_j] + q[s]) where
    r_j = rev_dst[s, j]. The g and p rows are gathered TOGETHER via one
    one-hot matmul against the concatenated window [g | p] ([V, 2H])."""
    i = pl.program_id(0)

    def w0_of(j):
        return pl.multiple_of(jnp.clip(j * tile - halo, 0, v - w), 32)

    n = pl.num_programs(0)

    slot = _windowed_dma(gp_hbm, win, sems, w0_of, pipelined, i, n)
    w0 = w0_of(i)
    rev_local = rev_t_ref[...] - w0
    deg = deg_ref[...].astype(jnp.int32)  # [tile, 1]
    q16 = q_ref[...]

    acc = jnp.zeros((tile, h), jnp.float32)
    ch = slot_chunk(tile)
    for c0 in range(0, d_slots, ch):
        cs = min(ch, d_slots - c0)
        rows = _onehot_rows(rev_local[c0:c0 + cs], win[slot], tile, w,
                            cs)
        for k in range(cs):
            d = c0 + k
            g_r = rows[k * tile:(k + 1) * tile, :h]
            # bf16 add matches the XLA VJP's compute dtype; the
            # compare runs in f32 (exact upcast — Mosaic has no bf16
            # vector cmpf lowering)
            p_r = rows[k * tile:(k + 1) * tile, h:].astype(jnp.bfloat16)
            z32 = (p_r + q16).astype(jnp.float32)
            m = g_r * (z32 > 0).astype(jnp.float32)
            acc = acc + jnp.where(d < deg, m, 0.0)

    out_ref[...] = acc.astype(out_ref.dtype)


def _window_geometry(v, tile, halo):
    assert v % tile == 0 and tile % 128 == 0, (v, tile)
    halo = -(-halo // 32) * 32  # 32-align so every window start is aligned
    w = min(tile + 2 * halo, v)
    assert w >= tile + 2 * halo or w == v
    assert v % 32 == 0 and w % 32 == 0
    return halo, w


def _call_windowed(kernel_fn, local, windowed, idx, deg, halo, tile,
                   interpret, h_out, out_dtype=jnp.bfloat16):
    """Shared pallas_call plumbing for the fwd/step/dq kernels: `local` is
    the per-receiver-tile operand (kept in its own dtype), `windowed` the
    HBM-resident bf16 gather source (callers pre-split f32 into planes),
    `idx` the [V, D] banded index table."""
    v = local.shape[0]
    d_slots = idx.shape[1]
    halo, w = _window_geometry(v, tile, halo)
    d_pad = -(-d_slots // 8) * 8
    h_loc = local.shape[1]

    kernel = functools.partial(kernel_fn, tile=tile, d_slots=d_slots,
                               h=h_loc, w=w, halo=halo, v=v,
                               pipelined=not interpret)
    deg2 = deg.astype(jnp.float32).reshape(v, 1)
    idx_t = jnp.zeros((d_pad, v), jnp.int32).at[:d_slots].set(idx.T)

    return pl.pallas_call(
        kernel,
        grid=(v // tile,),
        in_specs=[
            pl.BlockSpec((d_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # idx slice
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # deg tile
            pl.BlockSpec((tile, h_loc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # local tile
            pl.BlockSpec(memory_space=pl.ANY),       # window src in HBM
        ],
        out_specs=pl.BlockSpec((tile, h_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, h_out), out_dtype),
        # double-buffered window + DMA semaphores as scratch: scratch_shapes
        # is the documented mechanism for VMEM/semaphore state persisting
        # across sequential TPU grid steps (run_scoped buffers keeping their
        # address across steps was an implementation accident)
        scratch_shapes=[
            pltpu.VMEM((2, w, windowed.shape[1]), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx_t, deg2, local, windowed.astype(jnp.bfloat16))


def pallas_windowed_edge_conv_sum(p, q, nbr, deg, halo: int,
                                  tile: int = 256,
                                  interpret: bool = False,
                                  mode: str = "relu"):
    """out[v] = sum_d 1[d < deg[v]] relu(p[v] + q[nbr[v, d]]) (mode='relu')
    or the step-mask sum (mode='step') for graphs with
    |nbr[v, d] - v| <= halo on all valid slots.

    p, q: [V, H] bf16 (f32 inputs are cast; accumulation is f32);
    nbr: [V, D] int32; deg: [V]. Returns [V, H] in p.dtype.
    """
    out = _call_windowed(
        functools.partial(_kernel, mode=mode), p.astype(jnp.bfloat16), q,
        nbr, deg, halo, tile, interpret, h_out=p.shape[1])
    return out.astype(p.dtype)


def _f32_planes(x):
    """Exact bf16x3 split of an f32 array: x == hi + mid + lo with each
    part bf16-representable (x - hi has <=16 significant bits and is exact
    in f32; its own bf16 remainder has <=8 more). Exactness holds except
    at the very bottom of the exponent range (|x| near the f32 subnormal
    floor, where the residuals underflow) and for inf/nan.

    The roundings MUST be lax.reduce_precision, not .astype(bf16).astype
    (f32): XLA's excess-precision rule elides convert round-trips on TPU,
    which silently turned hi into x and the residual planes into zeros
    (measured: the kernel returned hi-only values, bf16-level error)."""
    x = x.astype(jnp.float32)
    hi = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    r1 = x - hi
    mid = jax.lax.reduce_precision(r1, exponent_bits=8, mantissa_bits=7)
    lo = r1 - mid
    # the casts below are exact: each plane is already bf16-representable
    return jnp.concatenate([hi.astype(jnp.bfloat16),
                            mid.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=1)


def pallas_windowed_edge_conv_sum_f32(p, q, nbr, deg, halo: int,
                                      tile: int = 256,
                                      interpret: bool = False,
                                      mode: str = "relu"):
    """EXACT f32 variant of pallas_windowed_edge_conv_sum: q is split into
    three bf16 planes ([V, 3H] window), the one-hot matmul returns the
    planes in f32, and (hi + mid) + lo reconstructs each gathered row
    bit-exactly — output is bit-identical to ops/ell.py's f32 path (same
    slot order, f32 adds)."""
    out = _call_windowed(
        functools.partial(_kernel, mode=mode, planes=3),
        p.astype(jnp.float32), _f32_planes(q), nbr, deg, halo, tile,
        interpret, h_out=p.shape[1], out_dtype=jnp.float32)
    return out.astype(p.dtype)


def pallas_windowed_dq(q, g, p, rev_dst, deg_out, halo: int,
                       tile: int = 256, interpret: bool = False):
    """dq[s] = sum_j 1[j < deg_out[s]] g[rev[s,j]] * step(p[rev[s,j]] + q[s])
    — the sender-side VJP of the windowed edge conv, gathering the (g, p)
    row pairs via one one-hot matmul against the [g | p] window."""
    gp = jnp.concatenate([g.astype(jnp.bfloat16),
                          p.astype(jnp.bfloat16)], axis=1)
    out = _call_windowed(_kernel_dq, q.astype(jnp.bfloat16), gp, rev_dst,
                         deg_out, halo, tile, interpret, h_out=q.shape[1])
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def windowed_ell_edge_conv_sum(halo, tile, interpret,
                               p, q, nbr, rev_dst, deg_in, deg_out):
    """Drop-in for ops/ell.py::ell_edge_conv_sum on bandwidth-ordered
    graphs (same argument order after the static halo/tile/interpret):
    gather-free windowed one-hot MXU forward AND backward."""
    return pallas_windowed_edge_conv_sum(p, q, nbr, deg_in, halo,
                                         tile=tile, interpret=interpret)


def _windowed_fwd(halo, tile, interpret, p, q, nbr, rev_dst,
                  deg_in, deg_out):
    out = pallas_windowed_edge_conv_sum(p, q, nbr, deg_in, halo,
                                        tile=tile, interpret=interpret)
    return out, (p, q, nbr, rev_dst, deg_in, deg_out)


def _windowed_bwd(halo, tile, interpret, res, g):
    p, q, nbr, rev_dst, deg_in, deg_out = res
    # dp[v] = g[v] * sum_d 1[d<deg] step(p[v] + q[nbr]) — step sum in-kernel
    step_sum = pallas_windowed_edge_conv_sum(
        p, q, nbr, deg_in, halo, tile=tile, interpret=interpret,
        mode="step")
    dp = (g.astype(jnp.float32) * step_sum.astype(jnp.float32)).astype(
        p.dtype)
    dq = pallas_windowed_dq(q, g, p, rev_dst, deg_out, halo, tile=tile,
                            interpret=interpret)
    return dp, dq.astype(q.dtype), None, None, None, None


windowed_ell_edge_conv_sum.defvjp(_windowed_fwd, _windowed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def windowed_ell_edge_conv_sum_f32(halo, tile, interpret,
                                   p, q, nbr, rev_dst, deg_in, deg_out):
    """f32 drop-in for ops/ell.py::ell_edge_conv_sum on bandwidth-ordered
    graphs: bit-exact windowed one-hot MXU forward (bf16x3 planes); the
    backward reuses the XLA gather-only VJP (ops/ell.py::_bwd_rule — a 6H
    plane window would double the dq matmul cost past break-even)."""
    return pallas_windowed_edge_conv_sum_f32(p, q, nbr, deg_in, halo,
                                             tile=tile, interpret=interpret)


def _windowed_f32_fwd(halo, tile, interpret, p, q, nbr, rev_dst,
                      deg_in, deg_out):
    out = pallas_windowed_edge_conv_sum_f32(p, q, nbr, deg_in, halo,
                                            tile=tile, interpret=interpret)
    return out, (p, q, nbr, rev_dst, deg_in, deg_out)


def _windowed_f32_bwd(halo, tile, interpret, res, g):
    from stinet_tpu.ops.ell import _bwd_rule
    return _bwd_rule(res, g)


windowed_ell_edge_conv_sum_f32.defvjp(_windowed_f32_fwd, _windowed_f32_bwd)

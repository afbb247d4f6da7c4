"""DMA-pipelined ELL edge-conv aggregation — the Pallas prototype named in
ops/pallas/README.md ("per-row DMA pipelines ... the one candidate worth
prototyping").

Computes the ELL forward (ops/ell.py::_forward semantics):

    out[v] = sum_d 1[d < deg[v]] * relu(p[v] + q[nbr[v, d]])

with q resident in HBM and sender rows streamed via explicit double-buffered
DMA, slot-major: for each receiver tile of T rows, stage all T sender rows of
slot d into VMEM while the VPU consumes slot d-1. The hypothesis under test
(README): explicit row DMAs can beat XLA's gather's ~25% HBM efficiency if
enough descriptors stay in flight; the risk is scalar-core descriptor issue
cost (T x D per tile).

Forward-only prototype: it is benchmarked against the XLA unrolled path by
`bench_pallas.py` on real hardware and adopted (with a custom VJP) only if it
wins. Correctness is asserted in interpret mode on CPU
(tests/test_pallas_gather.py).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nbr_hbm, deg_ref, p_ref, q_hbm, out_ref, *,
            tile, d_slots, h):
    """One receiver tile: stage nbr slice, then slot-major double-buffered
    row DMAs from q_hbm."""
    i = pl.program_id(0)

    def body(nbr_s, stage, acc, nbr_sem, row_sems):
        # 1. receiver tile's neighbor indices -> SMEM (scalars drive DMAs)
        nbr_dma = pltpu.make_async_copy(
            nbr_hbm.at[pl.ds(i * tile, tile), :], nbr_s, nbr_sem)
        nbr_dma.start()
        nbr_dma.wait()

        def issue(slot, d):
            """Start the T row DMAs for slot d into stage[slot]."""
            def issue_row(r, _):
                idx = nbr_s[r, d]
                pltpu.make_async_copy(
                    q_hbm.at[idx, :], stage.at[slot, r, :],
                    row_sems.at[slot, r]).start()
                return 0
            jax.lax.fori_loop(0, tile, issue_row, 0)

        def wait(slot):
            def wait_row(r, _):
                pltpu.make_async_copy(
                    q_hbm.at[0, :], stage.at[slot, r, :],
                    row_sems.at[slot, r]).wait()
                return 0
            jax.lax.fori_loop(0, tile, wait_row, 0)

        # 2. warm up slot 0, then pipeline: issue d+1 while consuming d
        issue(0, 0)
        acc[...] = jnp.zeros_like(acc)
        deg = deg_ref[...].astype(jnp.int32)  # [tile, 1]

        def consume(d, _):
            slot = jax.lax.rem(d, 2)

            @pl.when(d + 1 < d_slots)
            def _():
                issue(1 - slot, d + 1)

            wait(slot)
            m = jax.nn.relu(p_ref[...] + stage[slot])
            acc[...] += jnp.where(d < deg, m, 0.0)
            return 0

        jax.lax.fori_loop(0, d_slots, consume, 0)
        out_ref[...] = acc[...]

    pl.run_scoped(
        body,
        nbr_s=pltpu.SMEM((tile, d_slots), jnp.int32),
        stage=pltpu.VMEM((2, tile, h), jnp.float32),
        acc=pltpu.VMEM((tile, h), jnp.float32),
        nbr_sem=pltpu.SemaphoreType.DMA(()),
        row_sems=pltpu.SemaphoreType.DMA((2, tile)),
    )


def pallas_ell_edge_conv_sum(p, q, nbr, deg, tile: int = 256,
                             interpret: bool = False):
    """out[v] = sum_d 1[d < deg[v]] relu(p[v] + q[nbr[v, d]]).

    p, q: [V, H] f32; nbr: [V, D] int32 (pad slots must hold a valid row id);
    deg: [V] float or int. V must be a multiple of `tile`.
    """
    v, h = p.shape
    d_slots = nbr.shape[1]
    assert v % tile == 0, (v, tile)
    grid = (v // tile,)

    kernel = functools.partial(_kernel, tile=tile, d_slots=d_slots, h=h)
    deg2 = deg.astype(jnp.float32).reshape(v, 1)

    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # nbr in HBM
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),     # deg tile
                pl.BlockSpec((tile, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),     # p tile
                pl.BlockSpec(memory_space=pl.ANY),      # q stays in HBM
            ],
            out_specs=pl.BlockSpec((tile, h), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((v, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nbr, deg2, p, q)

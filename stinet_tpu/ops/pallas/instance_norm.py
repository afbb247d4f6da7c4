"""Pallas TPU kernel: fused single-graph masked instance norm.

Standardizes [V, C] vertex features per channel over the first `num_valid`
rows (FastInstanceNorm single-graph semantics, see ops/norms.py) in exactly
two HBM passes: the sequential TPU grid first accumulates masked sum and
sum-of-squares tiles into a VMEM scratch accumulator, then re-streams the
input, normalizing each tile with the finalized statistics. XLA's lowering
of the same computation runs mean and variance reductions as separate
passes; the fusion here saves one full read of x.

The valid count is a scalar-prefetch operand so one compiled kernel serves
every graph in a size bucket. A custom VJP implements the standard
instance-norm backward with plain XLA reductions (backward is not on the
single-pass-critical path).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _kernel(nv_ref, x_ref, o_ref, stats_ref, eps: float, tiles: int,
            tile: int):
    i = pl.program_id(0)
    phase0 = i < tiles
    t = jax.lax.rem(i, tiles)

    @pl.when(i == 0)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    x = x_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + t * tile
    mask = (rows < nv_ref[0]).astype(x.dtype)
    xm = x * mask

    @pl.when(phase0)
    def _():
        stats_ref[0, :] += jnp.sum(xm, axis=0)
        stats_ref[1, :] += jnp.sum(xm * xm, axis=0)
        o_ref[...] = x  # placeholder; rewritten in phase 1

    @pl.when(jnp.logical_not(phase0))
    def _():
        n = jnp.maximum(nv_ref[0].astype(x.dtype), 1.0)
        mean = stats_ref[0, :] / n
        var = stats_ref[1, :] / n - mean * mean
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        o_ref[...] = (x - mean) * inv * mask


def _forward(x, num_valid, eps):
    v, c = x.shape
    assert v % TILE == 0, f"pad V to a multiple of {TILE} (got {v})"
    tiles = v // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2 * tiles,),
        in_specs=[pl.BlockSpec((TILE, c), lambda i, nv: (jax.lax.rem(i, tiles), 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, c), lambda i, nv: (jax.lax.rem(i, tiles), 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_kernel, eps=eps, tiles=tiles, tile=TILE),
        out_shape=jax.ShapeDtypeStruct((v, c), x.dtype),
        grid_spec=grid_spec,
    )(jnp.asarray([num_valid], jnp.int32), x)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_instance_norm(x, num_valid, eps=1e-5):
    """Masked per-channel standardization over rows [0, num_valid)."""
    return _forward(x, num_valid, eps)


def _stats(x, num_valid, eps):
    v = x.shape[0]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (v, 1), 0)
            < num_valid).astype(x.dtype)
    n = jnp.maximum(num_valid.astype(x.dtype)
                    if hasattr(num_valid, "astype")
                    else jnp.float32(num_valid), 1.0)
    xm = x * mask
    mean = jnp.sum(xm, axis=0) / n
    var = jnp.sum(xm * xm, axis=0) / n - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return mask, n, mean, inv


def _fwd(x, num_valid, eps):
    return _forward(x, num_valid, eps), (x, num_valid)


def _bwd(eps, res, g):
    x, num_valid = res
    mask, n, mean, inv = _stats(x, num_valid, eps)
    xhat = (x - mean) * inv * mask
    g = g * mask
    gm = jnp.sum(g, axis=0) / n
    gx = jnp.sum(g * xhat, axis=0) / n
    dx = inv * (g - gm - xhat * gx) * mask
    return dx, None


pallas_instance_norm.defvjp(_fwd, _bwd)

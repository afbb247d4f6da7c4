"""Packed host->device transfer for graph pytrees.

Why this exists: a padded 65k-vertex HierarchicalGraph is ~77 leaves /
~20 MB, and `jax.device_put(graph)` issues one transfer per leaf. On the
serving measurements (bench_stream_phases.py, v5e via the axon tunnel) each
transfer call pays a ~20 ms fixed round-trip cost regardless of size, the
calls serialize, and `device_put` blocks until the bytes land — so the
per-leaf put costs ~2.0 s/scene while the SAME 20 MB as one buffer moves in
35-150 ms. That per-call cost, not bandwidth or compute, was the round-4
751 ms/scene end-to-end serving mystery (VERDICT r4 item 1).

The fix: flatten the pytree, concatenate every leaf's words into ONE host
uint32 buffer, `device_put` once, and re-slice the leaves on device inside a
single jitted program of static slices (XLA fuses the whole unpack; the
on-device copy is HBM-roofline, microseconds at these sizes). Encodings:

  raw32  any 4-byte dtype, bit-exact: host `.view(uint32)`, device
         same-width `lax.bitcast_convert_type` (no endianness ambiguity).
  u16    int32 leaves whose values all lie in [-1, 65534] — every vertex
         index table at V_pad <= 65535 qualifies (-1/0 padding sentinels
         included): stored biased-by-one as uint16 pairs packed in words,
         decoded with shifts/masks (element 0 = low half, matching numpy's
         little-endian view on the host — arithmetic, not bitcast, so the
         layout is pinned by this module at both ends). Halves the transfer
         bytes of the dominant int32 index tables, losslessly.
  u16x   int32 leaves in [-1, 131069]: biased uint16 low halves plus a
         1-bit-per-element overflow bitmap (packed 32/word). The flagship
         V=65536 scene pads level 0 to 65664 rows, so its dominant index
         tables (6.3 MB of the 15.7 MB wire image) overflow u16 by exactly
         the pad margin — this encoding recovers the 2x anyway for ~3%%
         bitmap overhead, losslessly. Decode: v = (lo | bit<<16) - 1.
  u8i    int32 leaves in [-1, 254] (graph_id, small enums): biased uint8,
         4 per word — 4x smaller, losslessly.
  u8f    float32 leaves whose every value is an INTEGER in [0, 255]
         (degree tables, 0/1 masks — integers are exactly representable in
         float32, so the round-trip is bit-exact): uint8, 4 per word.

All encodings are chosen per leaf from a single min/max/integrality scan
and every one is EXACT — the unpacked pytree is bit-identical to the
input (locked by tests/test_transfer.py round-trips).

The unpack program is cached per (treedef, shapes, dtypes, encodings)
signature; same-bucket scenes share one entry (serving's width ratchet
exists precisely to make those signatures plateau).

The reference has no analog — torch moves tensors one .to(device) at a
time (/root/reference/trainers/inpainting3d_trainer.py, per-batch tensor
moves); batching the transfer is a TPU-tunnel/PCIe-topology optimization.
"""
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_pytree", "unpack_on_device", "device_put_packed",
           "live_leaf_mask"]

_RAW32 = 0
_U16 = 1
_DEAD = 2
_U16X = 3
_U8I = 4
_U8F = 5


class _LeafSpec(NamedTuple):
    shape: Tuple[int, ...]
    dtype: str           # numpy dtype name of the ORIGINAL leaf
    enc: int             # _RAW32 | _U16
    off: int             # word offset into the packed buffer
    nwords: int


class PackSpec(NamedTuple):
    treedef: Any
    leaves: Tuple[_LeafSpec, ...]
    total_words: int


def _pick_encoding(arr: np.ndarray) -> int:
    """One min/max(/integrality) scan choosing the tightest exact wire
    encoding for `arr` (module docstring table)."""
    if arr.size == 0:
        return _RAW32
    if arr.dtype == np.int32:
        mn, mx = int(arr.min()), int(arr.max())
        if mn >= -1:
            if mx <= 254:
                return _U8I
            if mx <= 65534:
                return _U16
            if mx <= 131069:
                return _U16X
        return _RAW32
    if arr.dtype == np.float32:
        # sampled pre-check: real-valued feature leaves (colors, normals)
        # are fractional almost everywhere, so a 1k-element probe rejects
        # them without paying a full floor() pass over megabytes
        with np.errstate(invalid="ignore"):  # NaN compares are the reject
            head = arr.ravel()[:1024]
            if np.any(head != np.floor(head)):
                return _RAW32
            mn, mx = float(arr.min()), float(arr.max())
            if (0.0 <= mn and mx <= 255.0
                    and not np.any(arr != np.floor(arr))
                    # -0.0 passes every check above but would round-trip
                    # to +0.0, breaking the bit-identity contract
                    and not np.any(np.signbit(arr))):
                return _U8F
        return _RAW32
    return _RAW32


def live_leaf_mask(fn, *abstract_args) -> Tuple[bool, ...]:
    """Which leaves of `abstract_args` does `fn` actually read?

    Traces `fn` once over jax.ShapeDtypeStruct leaves (no device work) and
    runs a conservative backward dead-code sweep over the jaxpr: a leaf is
    DEAD only when no equation chain from it reaches an output. Equations
    are treated atomically (any live output keeps every input), so the
    answer can only over-approximate liveness — safe to drop the dead set
    from a host->device transfer and substitute zeros.

    Serving uses this to skip transferring graph tables the forward never
    touches: with the ELL fast path engaged, the COO src/dst mirrors stay
    on the host, and inference never reads graph.color / graph.mask (they
    feed the loss) — ~25-35%% of a padded 65k scene's bytes.
    """
    leaves, treedef = jax.tree_util.tree_flatten(abstract_args)
    abstract = [jax.ShapeDtypeStruct(np.asarray(x).shape
                                     if not hasattr(x, "shape") else x.shape,
                                     x.dtype) for x in leaves]

    def wrapper(*ls):
        return fn(*jax.tree_util.tree_unflatten(treedef, ls))

    closed = jax.make_jaxpr(wrapper)(*abstract)
    jaxpr = closed.jaxpr
    Var = type(jaxpr.invars[0]) if jaxpr.invars else None
    used = {v for v in jaxpr.outvars if Var is not None
            and isinstance(v, Var)}
    for eqn in reversed(jaxpr.eqns):
        if any(o in used for o in eqn.outvars):
            used.update(v for v in eqn.invars if isinstance(v, Var))
    return tuple(v in used for v in jaxpr.invars)


def _pad_view_u32(v: np.ndarray) -> np.ndarray:
    """View a u8/u16 vector as u32 words, zero-padding the tail."""
    per = 4 // v.dtype.itemsize
    if v.size % per:
        v = np.concatenate([v, np.zeros(per - v.size % per, v.dtype)])
    return v.view(np.uint32)


def _packbits_u32(bits: np.ndarray) -> np.ndarray:
    """Pack a 0/1 uint8 vector into u32 words: element i lands at bit
    (i % 32) of word (i // 32) — little-endian bits within each word,
    little-endian bytes across the word, which is exactly what
    np.packbits(bitorder='little') + a u32 view of the padded bytes give
    on a little-endian host. The device decoder `_unbits` mirrors this."""
    by = np.packbits(bits, bitorder="little")
    return _pad_view_u32(by)


def pack_pytree(tree, *, compress_indices: bool = True, live=None):
    """Flatten `tree` (4-byte-dtype leaves only) into (buffer, PackSpec).

    buffer is one contiguous host uint32 array; PackSpec drives
    `unpack_on_device`. With compress_indices, int32 leaves whose values
    fit [-1, 65534] travel as biased uint16 pairs (lossless; see module
    docstring). `live` (per-leaf bools from `live_leaf_mask`) drops dead
    leaves from the buffer entirely; unpack reproduces them as device-side
    zeros. Raises TypeError on a live leaf whose itemsize != 4.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if live is not None and len(live) != len(leaves):
        raise ValueError(f"live mask has {len(live)} entries for "
                         f"{len(leaves)} leaves")
    parts, specs, off = [], [], 0
    for i, leaf in enumerate(leaves):
        if live is not None and not live[i]:
            a0 = np.asarray(leaf)
            specs.append(_LeafSpec(tuple(a0.shape), a0.dtype.name, _DEAD,
                                   off, 0))
            continue
        a0 = np.asarray(leaf)
        # ascontiguousarray promotes 0-d scalars to 1-d: keep a0's shape
        arr = np.ascontiguousarray(a0)
        if arr.dtype.itemsize != 4:
            raise TypeError(
                f"pack_pytree: leaf dtype {arr.dtype} has itemsize "
                f"{arr.dtype.itemsize}; only 4-byte dtypes are packable")
        enc = _pick_encoding(arr) if compress_indices else _RAW32
        if enc == _U16:
            v = (arr.ravel().astype(np.int32) + 1).astype(np.uint16)
            words = _pad_view_u32(v)
        elif enc == _U16X:
            biased = arr.ravel() + np.int32(1)  # max 131070: no overflow
            lo = (biased & np.int32(0xFFFF)).astype(np.uint16)
            hi = (biased >> np.int32(16)).astype(np.uint8)  # 0/1 by gate
            words = np.concatenate(
                [_pad_view_u32(lo), _packbits_u32(hi)])
        elif enc == _U8I:
            v = (arr.ravel().astype(np.int32) + 1).astype(np.uint8)
            words = _pad_view_u32(v)
        elif enc == _U8F:
            v = arr.ravel().astype(np.uint8)
            words = _pad_view_u32(v)
        else:
            words = arr.ravel().view(np.uint32)
            enc = _RAW32
        parts.append(words)
        specs.append(_LeafSpec(tuple(a0.shape), arr.dtype.name, enc, off,
                               words.size))
        off += words.size
    buf = (np.concatenate(parts) if parts
           else np.zeros(0, np.uint32))
    return buf, PackSpec(treedef, tuple(specs), off)


def _u16s_of(w, n):
    """First n uint16 halves of u32 words, as int32 (little-endian halves,
    mirroring `_pad_view_u32` on the host)."""
    lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (w >> jnp.uint32(16)).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=1).reshape(-1)[:n]


def _u8s_of(w, n):
    """First n uint8 bytes of u32 words, as int32."""
    b = jnp.stack([(w >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
                   for k in range(4)], axis=1)
    return b.reshape(-1)[:n].astype(jnp.int32)


def _unbits(w, n):
    """First n bits of u32 words, as int32 0/1 (mirrors `_packbits_u32`)."""
    bits = (w[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    return bits.reshape(-1)[:n].astype(jnp.int32)


def _unpack_leaf(buf, spec: _LeafSpec):
    if spec.enc == _DEAD:
        return jnp.zeros(spec.shape, jnp.dtype(spec.dtype))
    w = jax.lax.slice(buf, (spec.off,), (spec.off + spec.nwords,))
    n = int(np.prod(spec.shape, dtype=np.int64))
    if spec.enc == _U16:
        return (_u16s_of(w, n) - 1).reshape(spec.shape)
    if spec.enc == _U16X:
        nlo = (n + 1) // 2
        lo = _u16s_of(jax.lax.slice(w, (0,), (nlo,)), n)
        bit = _unbits(jax.lax.slice(w, (nlo,), (spec.nwords,)), n)
        return (lo + (bit << 16) - 1).reshape(spec.shape)
    if spec.enc == _U8I:
        return (_u8s_of(w, n) - 1).reshape(spec.shape)
    if spec.enc == _U8F:
        return _u8s_of(w, n).astype(jnp.float32).reshape(spec.shape)
    out = jax.lax.bitcast_convert_type(w, jnp.dtype(spec.dtype))
    return out.reshape(spec.shape)


class _HashableSpecKey(NamedTuple):
    treedef: Any
    leaves: Tuple[_LeafSpec, ...]
    sharding: Any


@functools.lru_cache(maxsize=512)
def _unpack_fn(key: _HashableSpecKey):
    leaves = key.leaves

    def _un(buf):
        return key.treedef.unflatten(
            [_unpack_leaf(buf, s) for s in leaves])

    out_shardings = None
    if key.sharding is not None:
        out_shardings = jax.tree_util.tree_unflatten(
            key.treedef, [key.sharding] * len(leaves))
    return jax.jit(_un, out_shardings=out_shardings)


def unpack_on_device(buf_dev, spec: PackSpec, sharding=None):
    """Rebuild the pytree from a device-resident packed buffer (one jitted
    program of static slices; cached per signature)."""
    return _unpack_fn(
        _HashableSpecKey(spec.treedef, spec.leaves, sharding))(buf_dev)


def device_put_packed(tree, *, sharding: Optional[Any] = None,
                      compress_indices: bool = True, live=None):
    """`jax.device_put(tree)` semantics through ONE host->device transfer.

    sharding: optional single (replicated) jax sharding applied to the
    buffer and every output leaf — the packed path for mesh-replicated
    serving params/graphs. live: optional per-leaf mask (live_leaf_mask);
    dead leaves become device-side zeros instead of transferred bytes.
    Falls back to plain `jax.device_put` if any live leaf is not 4-byte
    (none of the graph pytrees are today).
    """
    try:
        buf, spec = pack_pytree(tree, compress_indices=compress_indices,
                                live=live)
    except TypeError:
        return (jax.device_put(tree, sharding) if sharding is not None
                else jax.device_put(tree))
    buf_dev = (jax.device_put(buf, sharding) if sharding is not None
               else jax.device_put(buf))
    return unpack_on_device(buf_dev, spec, sharding=sharding)

"""Pallas encode kernel: bytes -> planar commands, whole block in VMEM.

Replaces the XLA ``ops/device.py`` encoder on the accelerator path -- its
``searchsorted``/gather compaction chains lower to per-element loops and
were measured at ~0.002 GB/s on hardware.  Here every stage is a uniform
roll/select network or an MXU contraction, the TPU-native dual of the
reference's cmpeq/movemask/ctz scan loop (rle8_extreme_cpu.h:768-931):

1. **boundaries**: neighbour compare (one flat roll) marks run starts; the
   tail past ``block_len`` is filled with an alternating out-of-alphabet
   pattern so no run crosses the valid length (rle8_extreme_cpu.h:111-338's
   scalar tail handled by construction).
2. **run lengths**: a suffix-min doubling scan gives each position the next
   boundary, hence each run start its length (the ctz dual).
3. **emission**: ``run_len >= min_count`` (rle8_extreme_cpu.h:5 cost model,
   scaled per family by the caller).
4. **coverage**: forward-fills of the emitted (start, length) pairs mark
   every byte as run-covered or literal.
5. **compaction**: the commands (packed sym|count + start position) and the
   literal bytes are stream-compacted with the LSB-first log-shift router
   (ops/shuffle.flat_compact) -- prefix sums replace the serial output
   cursor, rolls replace the scatter.

The result matches ``ops/planar.host_encode_block`` byte-for-byte (same
emission rule, same tail command), so the container serialization is
identical whichever encoder produced the columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import shuffle

ROW = 128


def _jroll(x, s, axis):
    return jnp.roll(x, s, axis)


def _proll(x, s, axis):
    return pltpu.roll(x, s, axis=axis)


def _encode_body(blen_ref, only_ref, x_ref, sym_ref, count_ref, litlen_ref,
                 lits_ref, meta_ref, *, R: int, cap_rows: int, min_count: int,
                 interpret: bool):
    roll = _jroll if interpret else _proll
    B = R * ROW
    b = pl.program_id(0)
    blen = blen_ref[b]
    only = only_ref[b]      # < 0: all runs; else Single-family filter

    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 0) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 1))
    valid = flat < blen
    x = x_ref[0].astype(jnp.int32)
    # out-of-alphabet alternating pad: boundaries at blen and every pad byte
    xm = jnp.where(valid, x, 256 + (flat & 1))

    prev = shuffle.flat_roll(xm, 1, roll)
    bnd = (xm != prev) | (flat == 0)

    # next boundary strictly after p -> run length at each run start
    bnd_pos = jnp.where(bnd, flat, B)
    nxt = jnp.where(flat < B - 1, shuffle.flat_roll(
        shuffle.suffix_min_tile(bnd_pos, roll), -1, roll), B)
    run_len = jnp.minimum(nxt, blen) - flat
    emit = bnd & valid & (run_len >= min_count) & ((only < 0) | (x == only))

    # coverage: forward-fill emitted (start, len) over the block
    start_ff = shuffle.inclusive_cummax_tile(
        jnp.where(emit, flat, -1), roll)
    len_ff, ff_valid = shuffle.forward_fill_tile(
        jnp.where(emit, run_len, 0), emit, roll)
    cov = ff_valid & (flat - start_ff < len_ff) & (start_ff >= 0)
    lit_keep = valid & ~cov

    n_runs = jnp.sum(emit.astype(jnp.int32))
    n_lits = jnp.sum(lit_keep.astype(jnp.int32))
    last_end = jnp.max(jnp.where(emit, flat + run_len, 0))

    # command compaction: sym|count packed in one lane, start in another
    packed = run_len * 256 + x
    (pk_c, st_c), _ = shuffle.flat_compact([packed, flat], emit, roll)
    pk_c = pk_c[:cap_rows]
    st_c = st_c[:cap_rows]
    k = (jax.lax.broadcasted_iota(jnp.int32, (cap_rows, ROW), 0) * ROW
         + jax.lax.broadcasted_iota(jnp.int32, (cap_rows, ROW), 1))
    real = k < n_runs
    count_c = jnp.where(real, pk_c >> 8, 0)
    sym_c = jnp.where(real, pk_c & 255, 0)
    start_c = jnp.where(real, st_c, 0)
    prev_end = jnp.where(k == 0, 0,
                         shuffle.flat_roll(start_c + count_c, 1, roll))
    ll = jnp.where(real, start_c - prev_end, 0)
    tail_lit = blen - jnp.where(n_runs > 0, last_end, 0)
    ll = jnp.where(k == n_runs, tail_lit, ll)

    sym_ref[0] = sym_c.astype(jnp.uint8)
    count_ref[0] = count_c
    litlen_ref[0] = ll

    # literal compaction
    (lit_c,), _ = shuffle.flat_compact([x], lit_keep, roll)
    lidx = flat
    lits_ref[0] = jnp.where(lidx < n_lits, lit_c, 0).astype(jnp.uint8)

    at = (jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 0) * ROW
          + jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 1))
    meta_ref[0] = jnp.where(at == 0, n_runs + 1,
                            jnp.where(at == 1, n_lits, 0))


@functools.partial(jax.jit, static_argnames=("capacity", "min_count",
                                             "interpret"))
def encode_blocks_kernel(x: jnp.ndarray, block_len: jnp.ndarray, *,
                         capacity: int, min_count: int = 6,
                         interpret: bool = False,
                         only_sym: jnp.ndarray | None = None):
    """Encode ``[nb, B]`` bytes into planar columns on-device.

    Returns ``(sym, count, lit_len, lits, n_cmds, n_lits)`` with shapes
    matching ``ops/device.encode_blocks``; byte-identical emission.
    ``B`` must be a multiple of 128 and ``capacity`` a multiple of 128.
    ``only_sym[nb]`` (or None) restricts emission per block (Single).
    """
    nb, B = x.shape
    assert B % ROW == 0 and capacity % ROW == 0, (B, capacity)
    R = B // ROW
    cap_rows = capacity // ROW
    assert cap_rows <= R, (capacity, B)
    if only_sym is None:
        only_sym = jnp.full(nb, -1, jnp.int32)

    kernel = functools.partial(_encode_body, R=R, cap_rows=cap_rows,
                               min_count=min_count, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, cap_rows, ROW), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, cap_rows, ROW), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, cap_rows, ROW), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 8, ROW), lambda b, *_: (b, 0, 0)),
        ],
    )
    sym, count, lit_len, lits, meta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, cap_rows, ROW), jnp.uint8),
            jax.ShapeDtypeStruct((nb, cap_rows, ROW), jnp.int32),
            jax.ShapeDtypeStruct((nb, cap_rows, ROW), jnp.int32),
            jax.ShapeDtypeStruct((nb, R, ROW), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 8, ROW), jnp.int32),
        ],
        interpret=interpret,
    )(block_len.astype(jnp.int32), only_sym.astype(jnp.int32),
      x.reshape(nb, R, ROW))
    return (sym.reshape(nb, capacity), count.reshape(nb, capacity),
            lit_len.reshape(nb, capacity), lits.reshape(nb, B),
            meta[:, 0, 0], meta[:, 0, 1])

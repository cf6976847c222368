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
                 interpret: bool, stage: int = 4):
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

    if stage == 1:               # profiling: boundaries only
        lits_ref[0] = bnd.astype(jnp.uint8)
        sym_ref[0] = jnp.zeros((cap_rows, ROW), jnp.uint8)
        count_ref[0] = jnp.zeros((cap_rows, ROW), jnp.int32)
        litlen_ref[0] = jnp.zeros((cap_rows, ROW), jnp.int32)
        meta_ref[0] = jnp.zeros((8, ROW), jnp.int32)
        return

    # the run containing p spans [prev boundary at/before p, next boundary
    # after p): one cummax + one suffix-min give both ends, and coverage
    # follows directly -- no forward-fill network
    bnd_pos = jnp.where(bnd, flat, B)
    nxt = jnp.where(flat < B - 1, shuffle.flat_roll(
        shuffle.suffix_min_tile(bnd_pos, roll), -1, roll), B)
    start = shuffle.inclusive_cummax_tile(jnp.where(bnd, flat, -1), roll)
    span = jnp.minimum(nxt, blen) - start
    run_len = jnp.minimum(nxt, blen) - flat      # == span at run starts
    filt = (only < 0) | (x == only)
    cov = (span >= min_count) & valid & filt & (start >= 0)
    emit = bnd & cov
    lit_keep = valid & ~cov

    n_runs = jnp.sum(emit.astype(jnp.int32))
    n_lits = jnp.sum(lit_keep.astype(jnp.int32))
    last_end = jnp.max(jnp.where(emit, flat + run_len, 0))

    if stage == 2:               # profiling: +run lengths and coverage
        lits_ref[0] = cov.astype(jnp.uint8)
        sym_ref[0] = jnp.zeros((cap_rows, ROW), jnp.uint8)
        count_ref[0] = jnp.zeros((cap_rows, ROW), jnp.int32)
        litlen_ref[0] = jnp.zeros((cap_rows, ROW), jnp.int32)
        meta_ref[0] = jnp.where((jax.lax.broadcasted_iota(
            jnp.int32, (8, ROW), 0) * ROW + jax.lax.broadcasted_iota(
            jnp.int32, (8, ROW), 1)) == 0, n_runs, n_lits)
        return

    # command compaction, two-level: per-row lane compact (7 levels), then
    # 4:1 slot packing (commands per 128-byte row <= 32 at min_count >= 4),
    # then the global LSB router on the quarter-size plane
    packed = run_len * 256 + x
    if R % 4 == 0 and min_count >= 4 and R // 4 >= 1:
        (pk_r, st_r), cnt = shuffle.row_compact([packed, flat], emit, roll)
        pk_p = shuffle.pack_rows4(pk_r, roll)
        st_p = shuffle.pack_rows4(st_r, roll)
        cnt_b = jnp.broadcast_to(cnt, (R, ROW))      # lane<cnt after pack
        cnt_p = shuffle.pack_rows4(cnt_b, roll)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (R // 4, ROW), 1)
        keep_p = (lane_p & 31) < cnt_p
        (pk_c, st_c), _ = shuffle.flat_compact([pk_p, st_p], keep_p, roll)
        pad = cap_rows - R // 4
        if pad > 0:
            z = jnp.zeros((pad, ROW), jnp.int32)
            pk_c = jnp.concatenate([pk_c, z], axis=0)
            st_c = jnp.concatenate([st_c, z], axis=0)
    else:
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

    if stage == 3:               # profiling: no literal compaction
        lits_ref[0] = jnp.zeros((R, ROW), jnp.uint8)
        meta_ref[0] = jnp.where((jax.lax.broadcasted_iota(
            jnp.int32, (8, ROW), 0) * ROW + jax.lax.broadcasted_iota(
            jnp.int32, (8, ROW), 1)) == 0, n_runs + 1, n_lits)
        return

    # literal compaction
    (lit_c,), _ = shuffle.flat_compact([x], lit_keep, roll)
    lidx = flat
    lits_ref[0] = jnp.where(lidx < n_lits, lit_c, 0).astype(jnp.uint8)

    at = (jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 0) * ROW
          + jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 1))
    meta_ref[0] = jnp.where(at == 0, n_runs + 1,
                            jnp.where(at == 1, n_lits, 0))


@functools.partial(jax.jit, static_argnames=("capacity", "min_count",
                                             "interpret", "stage"))
def encode_blocks_kernel(x: jnp.ndarray, block_len: jnp.ndarray, *,
                         capacity: int, min_count: int = 6,
                         interpret: bool = False,
                         only_sym: jnp.ndarray | None = None,
                         stage: int = 4):
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
                               min_count=min_count, interpret=interpret,
                               stage=stage)
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
        # the compaction networks keep several [R,128] i32 planes live at
        # once; the default 16 MiB scoped-vmem cap is too tight at 64 KiB+
        # blocks (measured OOM on v5e)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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

"""Pallas encode kernel: bytes -> planar commands, G blocks per grid cell.

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

Round-5 restructure: the kernel processes **G blocks per grid cell** with
every scan/compaction network operating on ``[G, R, 128]`` tiles (the
shuffle primitives broadcast over leading axes).  The r4 kernel ran one
64 KiB block per cell, so its ~500 small-plane roll/select ops were
latency-bound; batching multiplies each op's element count by G without
changing the op count.  Per-block scalars (block_len, only_sym) ride in as
[G, 1] vector operands so the whole body stays batched.

The result matches ``ops/planar.host_encode_block`` byte-for-byte (same
emission rule, same tail command), so the container serialization is
identical whichever encoder produced the columns.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import shuffle

ROW = 128
_EGROUP = int(_os.environ.get("HSRK_ENCODE_G", "16"))  # blocks per grid cell
# (G sweep at the bench geometry: 8 -> 12.81 ms, 16 -> 12.49, 32 -> 12.81;
# G must keep the [G, 128] scalar-operand rows 8-sublane aligned)


def _jroll(x, s, axis):
    return jnp.roll(x, s, axis)


def _proll(x, s, axis):
    return pltpu.roll(x, s, axis=axis)


def _encode_body(blen_ref, only_ref, x_ref, sym_ref, count_ref, litlen_ref,
                 lits_ref, meta_ref, *, R: int, cap_rows: int, G: int,
                 min_count: int, interpret: bool, stage: int = 4):
    roll = _jroll if interpret else _proll
    B = R * ROW
    # per-block scalars as lane-replicated [G, 1, 128] planes: degenerate
    # [G, 1, 1] vectors trip a Mosaic layout check (arr.size >= rank)
    blen = blen_ref[...][:, None, :]
    only = only_ref[...][:, None, :]    # < 0: all runs; else Single

    def lane_total(v):
        # [G, 1, 128] partial sums -> every lane holds the full total
        for bb in range(7):
            v = v + roll(v, 1 << bb, v.ndim - 1)
        return v

    def lane_max(v):
        for bb in range(7):
            v = jnp.maximum(v, roll(v, 1 << bb, v.ndim - 1))
        return v

    flat = (jax.lax.broadcasted_iota(jnp.int32, (G, R, ROW), 1) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (G, R, ROW), 2))
    valid = flat < blen
    x = x_ref[...].astype(jnp.int32)
    # out-of-alphabet alternating pad: boundaries at blen and every pad byte
    xm = jnp.where(valid, x, 256 + (flat & 1))

    prev = shuffle.flat_roll(xm, 1, roll)
    bnd = (xm != prev) | (flat == 0)

    if stage == 1:               # profiling: boundaries only
        lits_ref[...] = bnd.astype(jnp.uint8)
        sym_ref[...] = jnp.zeros((G, cap_rows, ROW), jnp.uint8)
        count_ref[...] = jnp.zeros((G, cap_rows, ROW), jnp.int32)
        litlen_ref[...] = jnp.zeros((G, cap_rows, ROW), jnp.int32)
        meta_ref[...] = jnp.zeros((G, 8, ROW), jnp.int32)
        return

    # coverage by morphology (round 5; replaces a 16-level suffix-min +
    # 17-level cummax, measured 4.6 ms of the kernel's 24): a byte is
    # run-covered iff it sits in a stretch of >= min_count equal bytes.
    # e2(p) = the last min_count-1 neighbour-compares all equal (window
    # AND); cov = e2 dilated min_count-1 forward (window OR).  Runs
    # longer than min_count extend e2, so the dilation paints exactly
    # the run's span.  Wrap pollution at tile edges is masked by flat
    # bounds (full blocks wrap onto real data, not pad).
    eq = (~bnd).astype(jnp.int32)
    w = min_count - 1
    e2 = eq
    done = 1
    while done < w:
        step = min(done, w - done)
        e2 = e2 & shuffle.flat_roll(e2, step, roll)
        done += step
    e2 = jnp.where(flat >= w, e2, 0)
    cov_i = e2
    j = 1
    while j < min_count:
        step = min(j, min_count - j)
        cov_i = cov_i | jnp.where(flat < B - step,
                                  shuffle.flat_roll(cov_i, -step, roll), 0)
        j += step
    filt = (only < 0) | (x == only)
    cov = (cov_i > 0) & valid & filt
    emit = bnd & cov
    lit_keep = valid & ~cov

    # exclusive cumsum of coverage: run lengths become CC differences of
    # consecutive compacted starts (one triangular matmul + a short
    # cross-row scan instead of per-position length scans)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    li128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 0)
    tri = (lane128 >= li128).astype(jnp.bfloat16)
    covb = cov.astype(jnp.bfloat16)
    incl = jax.lax.dot_general(
        covb.reshape(G * R, ROW), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    incl = incl.reshape(G, R, ROW)
    rowt = incl[:, :, ROW - 1:ROW]                          # [G, R, 1]
    rt = jnp.swapaxes(rowt, 1, 2)                           # [G, 1, R]
    lane_r = jax.lax.broadcasted_iota(jnp.int32, rt.shape, 2)
    for bb in range(max(1, (R - 1).bit_length())):
        rt = rt + jnp.where(lane_r >= (1 << bb),
                            roll(rt, 1 << bb, 2), 0)
    rowcarry = jnp.swapaxes(rt, 1, 2) - rowt                # exclusive
    CCx = rowcarry + incl - cov.astype(jnp.int32)

    n_runs = lane_total(jnp.sum(emit.astype(jnp.int32), axis=1,
                                keepdims=True))             # [G, 1, 128]
    n_lits = lane_total(jnp.sum(lit_keep.astype(jnp.int32), axis=1,
                                keepdims=True))
    n_cov = lane_total(jnp.sum(cov.astype(jnp.int32), axis=1,
                               keepdims=True))

    at8 = (jax.lax.broadcasted_iota(jnp.int32, (G, 8, ROW), 1) * ROW
           + jax.lax.broadcasted_iota(jnp.int32, (G, 8, ROW), 2))

    if stage == 2:               # profiling: +coverage and CC
        lits_ref[...] = cov.astype(jnp.uint8)
        sym_ref[...] = jnp.zeros((G, cap_rows, ROW), jnp.uint8)
        count_ref[...] = jnp.zeros((G, cap_rows, ROW), jnp.int32)
        litlen_ref[...] = jnp.zeros((G, cap_rows, ROW), jnp.int32)
        meta_ref[...] = jnp.where(at8 == 0, n_runs, n_lits)
        return

    # command compaction, two-level: per-row lane compact (7 levels), then
    # 4:1 slot packing (commands per 128-byte row <= 32 at min_count >= 4),
    # then the global LSB router on the quarter-size plane
    packed = (CCx << 8) | x
    if R % 4 == 0 and min_count >= 4 and R // 4 >= 1:
        # the row router needs no position column: the ridden displacement
        # d gives each slot's source lane (shuffle.row_compact want_d)
        (pk_r,), cnt, d_r = shuffle.row_compact([packed], emit, roll,
                                                want_d=True)
        pk_p = shuffle.pack_rows4(pk_r, roll)
        d_p = shuffle.pack_rows4(d_r, roll)
        cnt_b = jnp.broadcast_to(cnt, (G, R, ROW))   # lane<cnt after pack
        cnt_p = shuffle.pack_rows4(cnt_b, roll)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (G, R // 4, ROW), 2)
        keep_p = (lane_p & 31) < cnt_p
        # source flat position rebuilt in the packed domain: quarter slot
        # (r2, l) came from row 4*r2 + l//32, lane (l & 31) + d
        row_p = (jax.lax.broadcasted_iota(jnp.int32, (G, R // 4, ROW), 1) * 4
                 + (lane_p >> 5))
        st_p = row_p * ROW + (lane_p & 31) + d_p
        (pk_c, st_c), _ = shuffle.flat_compact([pk_p, st_p], keep_p, roll)
        pad = cap_rows - R // 4
        if pad > 0:
            z = jnp.zeros((G, pad, ROW), jnp.int32)
            pk_c = jnp.concatenate([pk_c, z], axis=1)
            st_c = jnp.concatenate([st_c, z], axis=1)
    else:
        (pk_c, st_c), _ = shuffle.flat_compact([packed, flat], emit, roll)
    pk_c = pk_c[:, :cap_rows]
    st_c = st_c[:, :cap_rows]
    k = (jax.lax.broadcasted_iota(jnp.int32, (G, cap_rows, ROW), 1) * ROW
         + jax.lax.broadcasted_iota(jnp.int32, (G, cap_rows, ROW), 2))
    real = k < n_runs
    CC_c = jnp.where(real, jax.lax.shift_right_logical(pk_c, 8), 0)
    sym_c = jnp.where(real, pk_c & 255, 0)
    start_c = jnp.where(real, st_c, 0)
    # run i's length = covered bytes between consecutive starts (bytes in
    # the gap are literals, coverage 0), so counts are CC differences in
    # the compacted domain; the last run closes against the block total
    CC_n = jnp.where(k == n_runs - 1, n_cov,
                     shuffle.flat_roll(CC_c, -1, roll))
    count_c = jnp.where(real, CC_n - CC_c, 0)
    last_end = lane_max(jnp.max(
        jnp.where(k == n_runs - 1, start_c + count_c, 0), axis=1,
        keepdims=True))
    kz = (jax.lax.broadcasted_iota(jnp.int32, (G, cap_rows, ROW), 1) * ROW
          + jax.lax.broadcasted_iota(jnp.int32, (G, cap_rows, ROW), 2)) == 0
    prev_end = jnp.where(kz, 0,
                         shuffle.flat_roll(start_c + count_c, 1, roll))
    ll = jnp.where(real, start_c - prev_end, 0)
    tail_lit = blen - jnp.where(n_runs > 0, last_end, 0)
    ll = jnp.where(k == n_runs, tail_lit, ll)

    sym_ref[...] = sym_c.astype(jnp.uint8)
    count_ref[...] = count_c
    litlen_ref[...] = ll

    if stage == 3:               # profiling: no literal compaction
        lits_ref[...] = jnp.zeros((G, R, ROW), jnp.uint8)
        meta_ref[...] = jnp.where(at8 == 0, n_runs + 1, n_lits)
        return

    # literal compaction; the displacement (dropped = covered bytes
    # before, pad rows excluded by the keep mask) is the coverage prefix
    # CCx already in hand, so the router's internal cumsum is skipped
    (lit_c,), _ = shuffle.flat_compact([x], lit_keep, roll, d=CCx)
    lits_ref[...] = jnp.where(flat < n_lits, lit_c, 0).astype(jnp.uint8)

    meta_ref[...] = jnp.where(at8 == 0, n_runs + 1,
                              jnp.where(at8 == 1, n_lits, 0))


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

    # small batches take G = nb so the [G, 128] scalar-operand block
    # equals its array shape (the compiled lowering requires trailing
    # block dims divisible by (8, 128) or equal to the array's)
    G = _EGROUP if nb >= _EGROUP else nb
    nbp = -(-nb // G) * G
    blv = block_len.astype(jnp.int32)
    osv = only_sym.astype(jnp.int32)
    if nbp != nb:
        padb = nbp - nb
        x = jnp.pad(x, ((0, padb), (0, 0)))
        blv = jnp.pad(blv, (0, padb))        # blen 0: emits 1 empty tail
        osv = jnp.pad(osv, (0, padb), constant_values=-1)

    kernel = functools.partial(_encode_body, R=R, cap_rows=cap_rows, G=G,
                               min_count=min_count, interpret=interpret,
                               stage=stage)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nbp // G,),
        in_specs=[
            # per-block scalars ride in as full 128-lane rows: a [G, 1]
            # block tripped a Mosaic layout check (degenerate minor dim)
            pl.BlockSpec((G, ROW), lambda b: (b, 0)),
            pl.BlockSpec((G, ROW), lambda b: (b, 0)),
            pl.BlockSpec((G, R, ROW), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, cap_rows, ROW), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, cap_rows, ROW), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, cap_rows, ROW), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, R, ROW), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, 8, ROW), lambda b: (b, 0, 0)),
        ],
    )
    sym, count, lit_len, lits, meta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # the compaction networks keep several [G,R,128] i32 planes live at
        # once; the default 16 MiB scoped-vmem cap is too tight (measured
        # OOM on v5e at 64 KiB blocks before batching)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((nbp, cap_rows, ROW), jnp.uint8),
            jax.ShapeDtypeStruct((nbp, cap_rows, ROW), jnp.int32),
            jax.ShapeDtypeStruct((nbp, cap_rows, ROW), jnp.int32),
            jax.ShapeDtypeStruct((nbp, R, ROW), jnp.uint8),
            jax.ShapeDtypeStruct((nbp, 8, ROW), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.tile(blv.reshape(nbp, 1), (1, ROW)),
      jnp.tile(osv.reshape(nbp, 1), (1, ROW)), x.reshape(nbp, R, ROW))
    return (sym[:nb].reshape(nb, capacity), count[:nb].reshape(nb, capacity),
            lit_len[:nb].reshape(nb, capacity), lits[:nb].reshape(nb, B),
            meta[:nb, 0, 0], meta[:nb, 0, 1])

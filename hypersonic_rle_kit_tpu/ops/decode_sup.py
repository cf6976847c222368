"""Decode kernel v5: sorted-event supertile decode, O(compressed) everywhere.

The flagship device decode path (supersedes ops/decode_kernel.py, whose
per-supertile O(C) stream reductions and 8-row window slack capped it at
~1.8 GB/s on hardware).  The whole pipeline is one jit:

    planar columns [nb, C] (device)  --XLA-->  sorted event stream + tables
                                     --Pallas-->  decoded bytes [nb, B]

so the host contribution to a decompress is only the container unpack; the
accelerator reads O(compressed) inputs and writes O(uncompressed) output,
like the reference decoder that touches only compressed bytes
(rle8_extreme_cpu.h:1825-1913) and the OpenCL device path that uploads the
payload only (rle8_ocl.c:335-348).

Representation.  Every run becomes two *events* in one stream sorted by
output position (opens and closes interleave already ordered, because runs
are disjoint and commands are emitted in order -- no sort, no bucketing):

    open   at run_start:  value +(sym + 1)
    close  at run_end:    value -(sym + 1)

packed as ``pos << 10 | (value + 256)`` in one int32.  The prefix sum of
event values over output positions is then *exactly* ``sym + 1`` at covered
bytes and 0 at literal bytes (open/close pairs telescope; runs are
disjoint), so one scan yields coverage and symbol together:

    cum == 0  ->  literal byte        cum >= 1  ->  byte = cum - 1

Kernel (grid = blocks x supertiles, everything VMEM/registers):

1. **window**: the events of supertile ``t`` are a contiguous slice of the
   stream; two block-granular windows selected by a scalar-prefetched index
   cover it, and position-derived masks kill neighbouring supertiles'
   events -- no in-kernel search, no alignment slack.
2. **paint**: one-hot MXU contractions accumulate event values into the
   [rows, 128] supertile plane (the TPU-native scatter); groups with no
   live event are skipped at runtime, so cost tracks real command density.
3. **scan**: a triangular matmul + log-step row carry turns the painted
   deltas into per-byte ``sym + 1`` coverage (the MEMSET dual).  A second
   scan ranks literal bytes.
4. **literals**: ranks make the literal source a staircase; a dynamic
   window slice + log-step ``staircase_pull`` places every literal byte
   (the MEMCPY dual, ops/shuffle.py).

Supertile carries and literal offsets are O(TS) tables computed in XLA from
the same stream (vmapped binary search + prefix-sum gathers) -- the parallel
replacement for the reference's serial output cursor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import shuffle

ROW = 128
_POS_SHIFT = 10
_VAL_MASK = (1 << _POS_SHIFT) - 1
_VAL_OFF = 256
_PAD_POS = 1 << 20          # > any block position; (PAD_POS << 10) < 2^31
MAX_BLOCK = 1 << 19         # pos field must stay below _PAD_POS
_PAD_WORD = (_PAD_POS << _POS_SHIFT) | _VAL_OFF

DEFAULT_SUP = 4096
WR_BUCKETS = (1, 2, 4, 8, 12)   # window rows (x128 events) per supertile


def _jroll(x, s, axis):
    return jnp.roll(x, s, axis)


def _proll(x, s, axis):
    return pltpu.roll(x, s, axis=axis)


# ---------------------------------------------------------------------------
# XLA prep: planar columns -> event stream + per-supertile tables
# ---------------------------------------------------------------------------

def _event_stream(sym, count, lit_len, n_cmds):
    """Planar columns [nb, C] -> (events [nb, 2C] i32 packed words,
    pos [nb, 2C], signed values [nb, 2C]).  Events are position-sorted by
    construction; padding commands become sentinel words past the end."""
    nb, C = count.shape
    c_idx = jnp.arange(C, dtype=jnp.int32)[None, :]
    real = c_idx < n_cmds[:, None]
    ll = jnp.where(real, lit_len, 0)
    ct = jnp.where(real, count, 0)
    cum = jnp.cumsum(ll + ct, axis=-1)
    run_end = cum
    run_start = cum - ct
    is_run = real & (ct > 0)

    v = sym.astype(jnp.int32) + 1                     # +1: cum==0 <=> literal
    po = jnp.where(is_run, run_start, _PAD_POS)
    pc = jnp.where(is_run, run_end, _PAD_POS)
    vo = jnp.where(is_run, v, 0)
    pos = jnp.stack([po, pc], axis=-1).reshape(nb, 2 * C)
    val = jnp.stack([vo, -vo], axis=-1).reshape(nb, 2 * C)
    ev = (pos << _POS_SHIFT) | (val + _VAL_OFF)
    return ev, pos, val


def _sup_tables(pos, val, n_lits, block_len, *, block_size, sup):
    """Per-supertile tables from the sorted event stream:

    e_start [nb, TS+1]  first event index at/after each supertile bound
    carry   [nb, TS]    sym+1 of a run spanning into the supertile (else 0)
    lit0    [nb, TS]    literal bytes before the supertile
    """
    nb = pos.shape[0]
    TS = block_size // sup
    bounds = jnp.arange(TS + 1, dtype=jnp.int32) * sup
    e_start = jax.vmap(lambda p: jnp.searchsorted(p, bounds).astype(jnp.int32)
                       )(pos)

    def pref(x):                                     # [nb, E] -> gatherable
        c = jnp.cumsum(x, axis=-1)
        return jnp.concatenate([jnp.zeros((nb, 1), c.dtype), c], axis=-1)

    at = e_start[:, :TS]
    carry = jnp.take_along_axis(pref(val), at, axis=-1)
    # covered bytes before bound b: sum over events pos<b of sign*(b - pos)
    sgn = jnp.sign(val)
    cI = jnp.take_along_axis(pref(sgn), at, axis=-1)
    cP = jnp.take_along_axis(pref(sgn * pos), at, axis=-1)
    bnd = bounds[None, :TS]
    covered = bnd * cI - cP
    lit0 = jnp.where(bnd <= block_len[:, None], bnd - covered,
                     n_lits[:, None]).astype(jnp.int32)
    return e_start, carry.astype(jnp.int32), lit0


@functools.partial(jax.jit, static_argnames=("block_size", "sup"))
def max_events_per_sup(count, lit_len, n_cmds, *, block_size,
                       sup=DEFAULT_SUP):
    """Largest event count any single supertile must paint (drives the
    window-rows bucket).  Runs entirely on device; returns a scalar."""
    _, pos, _ = _event_stream(jnp.zeros_like(count, jnp.uint8), count,
                              lit_len, n_cmds)
    TS = block_size // sup
    bounds = jnp.arange(TS + 1, dtype=jnp.int32) * sup
    e = jax.vmap(lambda p: jnp.searchsorted(p, bounds).astype(jnp.int32))(pos)
    return jnp.max(jnp.diff(e, axis=-1)) if count.shape[0] else jnp.int32(0)


def pick_wr(max_events: int) -> int | None:
    """Smallest window bucket covering ``max_events`` per supertile."""
    for k in WR_BUCKETS:
        if k * ROW >= max_events:
            return k
    return None


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _decode_body(widx_ref, carry_ref, lit0_ref, blen_ref,
                 evA_ref, evB_ref, lits_ref, tri_ref, out_ref, acc_ref,
                 *, wr: int, sup_rows: int, lg_sup: int, interpret: bool):
    roll = _jroll if interpret else _proll
    sup = sup_rows * ROW
    b = pl.program_id(0)
    t = pl.program_id(1)
    blen = blen_ref[b]
    carry = carry_ref[b, t]
    l0 = lit0_ref[b, t]

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROW, sup_rows), 1)
    dn = (((0,), (0,)), ((), ()))

    acc_ref[...] = jnp.zeros((sup_rows, ROW), jnp.float32)

    def paint_window(ev):                      # ev: [wr, 128] i32
        tw = jnp.swapaxes(ev, 0, 1)            # [128, wr]
        for k in range(wr):
            w = tw[:, k:k + 1]                 # [128, 1]
            pos = jax.lax.shift_right_logical(w, _POS_SHIFT)
            keep = jax.lax.shift_right_logical(pos, lg_sup) == t
            val = jnp.where(keep, (w & _VAL_MASK) - _VAL_OFF, 0)
            live = jnp.any(val != 0)
            lpos = pos & (sup - 1)

            @pl.when(live)
            def _():
                rowm = ((lpos >> 7) == rows_iota).astype(jnp.bfloat16)
                lm = ((lpos & 127) == lane128).astype(jnp.bfloat16)
                bs = lm * val.astype(jnp.bfloat16)
                acc_ref[...] += jax.lax.dot_general(
                    rowm, bs, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)

    paint_window(evA_ref[0, 0])
    paint_window(evB_ref[0, 0])

    at00 = (jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 0) == 0) & \
           (jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 1) == 0)
    d = acc_ref[...].astype(jnp.int32) + jnp.where(at00, carry, 0)

    def row_scan(x_i32):
        """Inclusive row-major cumsum of a [r, 128] int plane: triangular
        matmul within rows + log-step carry across rows (exact: bf16
        operands are integers < 512, f32 accumulation)."""
        r = x_i32.shape[0]
        c = jax.lax.dot_general(
            x_i32.astype(jnp.bfloat16), tri_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        tot = c[:, ROW - 1:ROW]
        acc = tot
        rr = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        for bb in range(max(1, (r - 1).bit_length())):
            acc = acc + jnp.where(rr >= (1 << bb), roll(acc, 1 << bb, 0), 0)
        return c + (acc - tot)

    cum = row_scan(d)
    cov = cum >= 1
    sym_exp = ((cum - 1) & 0xFF).astype(jnp.uint8)

    flat = (jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 0) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 1))
    in_len = (t * sup + flat) < blen
    covi = cov.astype(jnp.int32)
    rank = flat - (row_scan(covi) - covi)      # literals before p (this sup)

    # literal window + staircase spread (module docstring, stage 4)
    w0 = pl.multiple_of((l0 >> 7) & ~7, 8)     # 8-aligned window row
    m = l0 - w0 * ROW                          # in-window offset (< 1024)
    win = lits_ref[0, pl.ds(w0, sup_rows + 9), :].astype(jnp.int32)
    OFF = 8 * ROW
    d_top = flat + OFF - (m + rank)
    qflat = (jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 0) * ROW
             + jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 1))
    d_pad = jnp.minimum(qflat, OFF - m)        # staircase filler rows
    d_all = jnp.concatenate([d_pad, d_top, jnp.zeros((1, ROW), jnp.int32)],
                            axis=0)
    pulled = shuffle.staircase_pull(win, d_all, roll)
    lit_exp = pulled[8:8 + sup_rows].astype(jnp.uint8)

    out = jnp.where(cov, sym_exp, lit_exp)
    out_ref[0] = jnp.where(in_len, out, 0)


def _decode_body_bg(rs8_ref, carry_ref, lit0_ref, blen_ref,
                    ev_ref, lits_ref, tri_ref, out_ref, acc_ref,
                    *, wn: int, sup_rows: int, lg_sup: int, TS: int,
                    interpret: bool, stage: int = 3):
    """Block-grid body: grid = (nb,), one cell decodes a whole block.

    Identical per-supertile math to :func:`_decode_body`, but the TS
    supertiles run as an unrolled inner loop over one VMEM-resident event
    buffer, so the per-grid-cell overhead (block fetch, pipeline step)
    amortizes over the block instead of recurring per 4 KiB supertile.
    Windows are dynamic 8-row-aligned slices of the event buffer selected
    by prefetched scalars (``wn`` static rows cover the worst alignment
    slack plus the density bucket)."""
    roll = _jroll if interpret else _proll
    sup = sup_rows * ROW
    b = pl.program_id(0)
    blen = blen_ref[b]

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROW, sup_rows), 1)
    dn = (((0,), (0,)), ((), ()))
    flat = (jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 0) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 1))
    at00 = (jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 0) == 0) & \
           (jax.lax.broadcasted_iota(jnp.int32, (sup_rows, ROW), 1) == 0)
    qflat = (jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 0) * ROW
             + jax.lax.broadcasted_iota(jnp.int32, (8, ROW), 1))
    OFF = 8 * ROW

    def row_scan(x_i32):
        r = x_i32.shape[0]
        c = jax.lax.dot_general(
            x_i32.astype(jnp.bfloat16), tri_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        tot = c[:, ROW - 1:ROW]
        acc = tot
        rr = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        for bb in range(max(1, (r - 1).bit_length())):
            acc = acc + jnp.where(rr >= (1 << bb), roll(acc, 1 << bb, 0), 0)
        return c + (acc - tot)

    for t in range(TS):
        carry = carry_ref[b, t]
        l0 = lit0_ref[b, t]
        rs8 = pl.multiple_of(rs8_ref[b, t], 8)
        win = ev_ref[0, pl.ds(rs8, wn), :]         # [wn, 128] i32
        acc_ref[...] = jnp.zeros((sup_rows, ROW), jnp.float32)
        tw = jnp.swapaxes(win, 0, 1)               # [128, wn]
        for k in range(wn):
            w = tw[:, k:k + 1]                     # [128, 1]
            pos = jax.lax.shift_right_logical(w, _POS_SHIFT)
            keep = jax.lax.shift_right_logical(pos, lg_sup) == t
            val = jnp.where(keep, (w & _VAL_MASK) - _VAL_OFF, 0)
            live = jnp.any(val != 0)
            lpos = pos & (sup - 1)

            @pl.when(live)
            def _():
                rowm = ((lpos >> 7) == rows_iota).astype(jnp.bfloat16)
                lm = ((lpos & 127) == lane128).astype(jnp.bfloat16)
                bs = lm * val.astype(jnp.bfloat16)
                acc_ref[...] += jax.lax.dot_general(
                    rowm, bs, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)

        if stage == 1:                 # profiling: paint only
            out_ref[0, t * sup_rows:(t + 1) * sup_rows, :] = \
                (acc_ref[...].astype(jnp.int32) + carry).astype(jnp.uint8)
            continue

        d = acc_ref[...].astype(jnp.int32) + jnp.where(at00, carry, 0)
        cum = row_scan(d)
        cov = cum >= 1
        sym_exp = ((cum - 1) & 0xFF).astype(jnp.uint8)

        in_len = (t * sup + flat) < blen
        if stage == 2:                 # profiling: paint + scans, no lits
            covi = cov.astype(jnp.int32)
            rank = flat - (row_scan(covi) - covi)
            out = jnp.where(cov, sym_exp, (rank & 0xFF).astype(jnp.uint8))
            out_ref[0, t * sup_rows:(t + 1) * sup_rows, :] = \
                jnp.where(in_len, out, 0)
            continue

        covi = cov.astype(jnp.int32)
        rank = flat - (row_scan(covi) - covi)

        w0 = pl.multiple_of((l0 >> 7) & ~7, 8)
        m = l0 - w0 * ROW
        lwin = lits_ref[0, pl.ds(w0, sup_rows + 9), :].astype(jnp.int32)
        d_top = flat + OFF - (m + rank)
        d_pad = jnp.minimum(qflat, OFF - m)
        d_all = jnp.concatenate(
            [d_pad, d_top, jnp.zeros((1, ROW), jnp.int32)], axis=0)
        pulled = shuffle.staircase_pull(lwin, d_all, roll)
        lit_exp = pulled[8:8 + sup_rows].astype(jnp.uint8)

        out = jnp.where(cov, sym_exp, lit_exp)
        out_ref[0, t * sup_rows:(t + 1) * sup_rows, :] = \
            jnp.where(in_len, out, 0)


PAINT_W = 48                  # windowed-paint rows (8-aligned slack incl.)
_CODE_DEAD = -1               # event row has no live events
_CODE_FULL = -2               # events span wider than the window


def _decode_body_flat(code_ref, blen_ref, ev_ref, lits_ref, tri_ref,
                      out_ref, acc_ref, acc2_ref, acc3_ref, acc4_ref,
                      *, ERp: int, R: int, interpret: bool, stage: int = 3):
    """Whole-block body: grid = (nb,), no supertiles.

    One paint / one scan / one staircase over the full [R, 128] block plane.
    The per-supertile variants issue ~50 small dependent ops per 4 KiB
    (latency-bound on the VPU); here every stage is one wide op sequence
    over the whole block, and the carry/lit0 tables disappear because the
    scans never cross a block boundary.  The literal displacement is simply
    the exclusive prefix count of covered bytes, so the rank scan and the
    windowed l0 bookkeeping of the supertile variants vanish too."""
    roll = _jroll if interpret else _proll
    b = pl.program_id(0)
    blen = blen_ref[b]

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROW, R), 1)
    dn = (((0,), (0,)), ((), ()))

    W = PAINT_W
    rows_iota_w = jax.lax.broadcasted_iota(jnp.int32, (ROW, min(W, R)), 1)

    accs = (acc_ref, acc2_ref, acc3_ref, acc4_ref)
    for a in accs:
        a[...] = jnp.zeros((R, ROW), jnp.float32)
    if stage == 0:                     # profiling: prep + launch + IO only
        out_ref[0] = jnp.full((R, ROW), blen & 0xFF, jnp.uint8)
        return

    # decode the event words once as whole-plane ops, then transpose so the
    # per-row loop below only slices columns (a [128,1] chain per event row
    # was the dominant kernel cost on hardware)
    ev = ev_ref[0]                                   # [ERp, 128] i32
    pos_p = jax.lax.shift_right_logical(ev, _POS_SHIFT)
    val_p = jnp.where(pos_p < R * ROW, (ev & _VAL_MASK) - _VAL_OFF, 0)
    t_row = jnp.swapaxes(pos_p >> 7, 0, 1)           # [128, ERp]
    t_lane = jnp.swapaxes(pos_p & 127, 0, 1)
    t_val = jnp.swapaxes(val_p.astype(jnp.bfloat16), 0, 1)

    for k in range(ERp):
        # window selection is precomputed in XLA prep and prefetched:
        # -1 = no live events (skip), -2 = span wider than the window
        # (full-width paint), else the 8-aligned window start row
        code = code_ref[b, k]
        # rotate accumulators so consecutive rows' read-modify-writes
        # don't serialize on one buffer (summed once after the loop)
        acc = accs[k % 4]

        def paint(rows, r0=None):
            rel = t_row[:, k:k + 1]
            if r0 is not None:
                rel = rel - r0
            rowm = (rel == rows).astype(jnp.bfloat16)
            lm = (t_lane[:, k:k + 1] == lane128).astype(jnp.bfloat16)
            bs = lm * t_val[:, k:k + 1]
            return jax.lax.dot_general(
                rowm, bs, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        if R <= W:
            @pl.when(code != _CODE_DEAD)
            def _():
                acc[...] += paint(rows_iota)
            continue

        # events are position-sorted, so one row's 128 events usually span
        # a narrow output range: paint into a W-row window of the
        # accumulator (O(W) per event row instead of O(R))
        @pl.when(code >= 0)
        def _():
            r0 = pl.multiple_of(code, 8)
            acc[pl.ds(r0, W), :] += paint(rows_iota_w, code)

        @pl.when(code == _CODE_FULL)
        def _():
            acc[...] += paint(rows_iota)

    def row_scan(x_i32):
        c = jax.lax.dot_general(
            x_i32.astype(jnp.bfloat16), tri_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        tot = c[:, ROW - 1:ROW]            # [R, 1] row totals
        # cross-row carry in lane-major layout: [R,1] keeps 1/128 of each
        # vreg busy and the log-step chain is R/8 vregs deep; transposed to
        # [1,R] the same scan runs on dense vregs
        tt = jnp.swapaxes(tot, 0, 1)       # [1, R]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        for bb in range((R - 1).bit_length()):
            tt = tt + jnp.where(lane >= (1 << bb), roll(tt, 1 << bb, 1), 0)
        acc = jnp.swapaxes(tt, 0, 1)       # [R, 1] inclusive row prefix
        return c + (acc - tot)

    painted = ((acc_ref[...] + acc2_ref[...])
               + (acc3_ref[...] + acc4_ref[...])).astype(jnp.int32)
    if stage == 1:                     # profiling: paint only
        out_ref[0] = (painted & 0xFF).astype(jnp.uint8)
        return

    cum = row_scan(painted)
    cov = cum >= 1
    sym_exp = ((cum - 1) & 0xFF).astype(jnp.uint8)

    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 0) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 1))
    if stage == 2:                     # profiling: no literal movement
        out_ref[0] = jnp.where(flat < blen, sym_exp, 0)
        return

    covi = cov.astype(jnp.int32)
    d_lit = row_scan(covi) - covi                  # covered bytes before p
    lit_exp = shuffle.staircase_pull(
        lits_ref[0].astype(jnp.int32), d_lit, roll).astype(jnp.uint8)

    out = jnp.where(cov, sym_exp, lit_exp)
    out_ref[0] = jnp.where(flat < blen, out, 0)


@functools.partial(jax.jit, static_argnames=("block_size", "sup", "wr",
                                             "interpret", "grid_mode",
                                             "stage"))
def decode_columns_device(sym, count, lit_len, lits, n_cmds, n_lits,
                          block_len, *, block_size: int, sup: int = DEFAULT_SUP,
                          wr: int = 2, interpret: bool = False,
                          grid_mode: str = "flat",
                          stage: int = 3) -> jnp.ndarray:
    """Planar columns (device arrays) -> decoded [nb, block_size] uint8.

    ``wr`` (static) must satisfy ``wr * 128 >= max_events_per_sup(...)`` --
    use :func:`pick_wr`.  ``sup`` is the supertile size (power of two,
    divides ``block_size``).  ``grid_mode`` selects the launch shape:
    ``"block"`` (one grid cell per block, inner supertile loop -- the fast
    path) or ``"sup"`` (one cell per supertile, the original v5 launch).
    """
    nb, C = count.shape
    B = block_size
    assert B <= MAX_BLOCK, (B, MAX_BLOCK)
    assert B % ROW == 0, B
    assert grid_mode == "flat" or (sup & (sup - 1) == 0 and B % sup == 0), \
        (B, sup)
    sup_rows = sup // ROW
    lg_sup = sup.bit_length() - 1
    TS = B // sup
    R = B // ROW

    count = count.astype(jnp.int32)
    lit_len = lit_len.astype(jnp.int32)
    n_cmds = n_cmds.astype(jnp.int32)
    block_len = block_len.astype(jnp.int32)

    ev, pos, val = _event_stream(sym, count, lit_len, n_cmds)
    E = ev.shape[1]

    tri = jnp.asarray(np.tril(np.ones((ROW, ROW), np.float32)).T,
                      jnp.bfloat16)             # tri[p, j] = p <= j

    if grid_mode == "flat":
        ERp = max(8, -(-E // (8 * ROW)) * 8)
        ev_rows = jnp.full((nb, ERp * ROW), _PAD_WORD, jnp.int32)
        ev_rows = jax.lax.dynamic_update_slice(ev_rows, ev, (0, 0))
        ev3 = ev_rows.reshape(nb, ERp, ROW)
        lw = lits.shape[1]
        lits_pad = (lits[:, :R * ROW] if lw >= R * ROW
                    else jnp.pad(lits, ((0, 0), (0, R * ROW - lw))))
        lits3 = lits_pad.reshape(nb, R, ROW)

        # per-event-row paint windows, computed here so the kernel's paint
        # loop is branch-on-scalar only (kernel docstring)
        pos3 = jax.lax.shift_right_logical(ev3, _POS_SHIFT)
        valid3 = pos3 < R * ROW
        live3 = jnp.any(valid3 & ((ev3 & _VAL_MASK) != _VAL_OFF), axis=-1)
        pmin = jnp.min(jnp.where(valid3, pos3, R * ROW), axis=-1)
        pmax = jnp.max(jnp.where(valid3, pos3, 0), axis=-1)
        r0 = jnp.clip((pmin >> 7) & ~7, 0, max(R - PAINT_W, 0))
        full = (pmax >> 7) >= r0 + PAINT_W
        code = jnp.where(~live3, _CODE_DEAD,
                         jnp.where(full, _CODE_FULL, r0)).astype(jnp.int32)

        kernel = functools.partial(_decode_body_flat, ERp=ERp, R=R,
                                   interpret=interpret, stage=stage)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, ERp, ROW), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((ROW, ROW), lambda b, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((R, ROW), jnp.float32)] * 4,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, ROW), jnp.uint8),
            interpret=interpret,
        )(code, block_len, ev3, lits3, tri)
        return out.reshape(nb, B)

    e_start, carry, lit0 = _sup_tables(pos, val, n_lits.astype(jnp.int32),
                                       block_len, block_size=B, sup=sup)

    LR = R + sup_rows + 16
    lits_pad = jnp.pad(lits, ((0, 0), (0, LR * ROW - lits.shape[1])))
    lits3 = lits_pad.reshape(nb, LR, ROW)

    if grid_mode == "block":
        wn = wr + 8                             # 8-aligned slack + bucket
        rows_needed = -(-E // ROW)
        ERp = -(-(rows_needed + wn) // 8) * 8
        ev_rows = jnp.full((nb, ERp * ROW), _PAD_WORD, jnp.int32)
        ev_rows = jax.lax.dynamic_update_slice(ev_rows, ev, (0, 0))
        ev3 = ev_rows.reshape(nb, ERp, ROW)
        rs8 = ((e_start[:, :TS] // ROW) & ~7).astype(jnp.int32)

        kernel = functools.partial(_decode_body_bg, wn=wn,
                                   sup_rows=sup_rows, lg_sup=lg_sup, TS=TS,
                                   interpret=interpret, stage=stage)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, ERp, ROW), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, LR, ROW), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((ROW, ROW), lambda b, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((sup_rows, ROW), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R, ROW), jnp.uint8),
            interpret=interpret,
        )(rs8, carry, lit0, block_len, ev3, lits3, tri)
        return out.reshape(nb, B)

    crp = (-(-E // ROW) + 2 * wr + wr - 1) // wr * wr
    ev_rows = jnp.full((nb, crp * ROW), _PAD_WORD, jnp.int32)
    ev_rows = jax.lax.dynamic_update_slice(ev_rows, ev, (0, 0))
    # 4D window view: full-window blocks satisfy Mosaic's block-shape rule
    # at any wr, and two half-offset windows cover any supertile's events
    ev4 = ev_rows.reshape(nb, crp // wr, wr, ROW)
    widx = jnp.clip(e_start[:, :TS] // (wr * ROW), 0, crp // wr - 2)

    kernel = functools.partial(_decode_body, wr=wr, sup_rows=sup_rows,
                               lg_sup=lg_sup, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb, TS),
        in_specs=[
            pl.BlockSpec((1, 1, wr, ROW),
                         lambda b, t, widx, *_: (b, widx[b, t], 0, 0)),
            pl.BlockSpec((1, 1, wr, ROW),
                         lambda b, t, widx, *_: (b, widx[b, t] + 1, 0, 0)),
            pl.BlockSpec((1, LR, ROW), lambda b, t, *_: (b, 0, 0)),
            pl.BlockSpec((ROW, ROW), lambda b, t, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sup_rows, ROW),
                               lambda b, t, *_: (b, t, 0)),
        scratch_shapes=[pltpu.VMEM((sup_rows, ROW), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, ROW), jnp.uint8),
        interpret=interpret,
    )(widx, carry, lit0, block_len, ev4, ev4, lits3, tri)
    return out.reshape(nb, B)


def decode_planar_sup(sym, count, lit_len, lits, n_cmds, n_lits, block_len,
                      *, block_size: int, sup: int = DEFAULT_SUP,
                      wr: int | None = None, interpret: bool = False,
                      grid_mode: str = "flat"):
    """Host-array convenience wrapper: picks the window bucket on device,
    then decodes.  Raises if the stream is denser than any bucket."""
    count = jnp.asarray(np.asarray(count, np.int32))
    lit_len = jnp.asarray(np.asarray(lit_len, np.int32))
    n_cmds = jnp.asarray(np.asarray(n_cmds, np.int32))
    if grid_mode == "flat":
        wr = 1                       # unused by the whole-block launch
    elif wr is None:
        mx = int(max_events_per_sup(count, lit_len, n_cmds,
                                    block_size=block_size, sup=sup))
        wr = pick_wr(mx)
        if wr is None:
            raise ValueError(f"event density {mx} exceeds window buckets")
    return decode_columns_device(
        jnp.asarray(np.asarray(sym, np.uint8)), count, lit_len,
        jnp.asarray(np.asarray(lits, np.uint8)), n_cmds,
        jnp.asarray(np.asarray(n_lits, np.int32)),
        jnp.asarray(np.asarray(block_len, np.int32)),
        block_size=block_size, sup=sup, wr=wr, interpret=interpret,
        grid_mode=grid_mode)

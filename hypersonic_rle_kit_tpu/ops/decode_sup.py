"""Flagship decode kernel: sorted-event whole-block decode, O(compressed)
device input everywhere.

The whole pipeline is one jit:

    planar columns [nb, C] (device)  --XLA-->  sorted event stream + windows
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

Kernel (grid = one cell per block; every stage is one wide op sequence over
the [R, 128] block plane -- per-supertile variants were latency-bound on
dependent small ops and were retired after hardware stage profiling):

1. **paint**: one-hot MXU contractions accumulate event values into the
   block plane (the TPU-native scatter).  Window rows are precomputed in
   XLA and scalar-prefetched: dead event rows skip on a scalar branch,
   narrow spans paint a 48-row window, wide spans take the full plane.
   Four rotating accumulators keep consecutive read-modify-writes from
   serializing behind one buffer.
2. **scan**: a triangular matmul + lane-major log-step row carry turns the
   painted deltas into per-byte ``sym + 1`` coverage (the MEMSET dual).
3. **literals**: the exclusive prefix count of covered bytes is the
   literal displacement; a log-step ``staircase_pull`` places every literal
   byte (the MEMCPY dual, ops/shuffle.py).
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








# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------



_CODE_DEAD = -1               # event row has no live events
_CODE_FULL = -2               # events span wider than the window


def paint_window_rows(R: int, G: int) -> int:
    """Windowed-paint rows: wide enough that a typical paint group's
    (G x 128 sorted events) position span fits, 8-aligned slack included.
    HSRK_PAINT_W overrides (perf experiments)."""
    import os
    e = os.environ.get("HSRK_PAINT_W")
    if e:
        return min(R, int(e))
    return min(R, 48 * G)   # measured best: 48 at G=1, 96 at G=2


def paint_group() -> int:
    """Event rows batched per one-hot paint matmul (K = G * 128)."""
    import os
    return int(os.environ.get("HSRK_PAINT_G", "2"))


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

    G = paint_group()
    K = G * ROW
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (K, ROW), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
    dn = (((0,), (0,)), ((), ()))

    W = paint_window_rows(R, G)
    rows_iota_w = jax.lax.broadcasted_iota(jnp.int32, (K, min(W, R)), 1)

    accs = (acc_ref, acc2_ref, acc3_ref, acc4_ref)
    for a in accs:
        a[...] = jnp.zeros((R, ROW), jnp.float32)
    if stage == 0:                     # profiling: prep + launch + IO only
        out_ref[0] = jnp.full((R, ROW), blen & 0xFF, jnp.uint8)
        return

    # events arrive pre-transposed ([K, ERp//G], XLA prep), so the word
    # decode is whole-plane and the paint loop only slices columns (a
    # [128,1] chain per event row was the dominant kernel cost on hardware)
    ev = ev_ref[0]                                   # [K, ERp//G] i32
    pos_p = jax.lax.shift_right_logical(ev, _POS_SHIFT)
    val_p = jnp.where(pos_p < R * ROW, (ev & _VAL_MASK) - _VAL_OFF, 0)
    t_row = pos_p >> 7
    t_lane = pos_p & 127
    t_val = val_p.astype(jnp.bfloat16)

    for k in range(ERp // G):
        # window selection is precomputed in XLA prep and prefetched:
        # -1 = no live events (skip), -2 = span wider than the window
        # (full-width paint), else the 8-aligned window start row
        code = code_ref[b, k]
        # rotate accumulators so consecutive groups' read-modify-writes
        # don't serialize on one buffer (summed once after the loop)
        acc = accs[k % 4]

        def col(t):                     # [K, 1]: G event rows stacked
            return t[:, k:k + 1]

        def paint(rows, r0=None):
            rel = col(t_row)
            if r0 is not None:
                rel = rel - r0
            rowm = (rel == rows).astype(jnp.bfloat16)
            lm = (col(t_lane) == lane128).astype(jnp.bfloat16)
            bs = lm * col(t_val)
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


@functools.partial(jax.jit, static_argnames=("block_size", "interpret",
                                             "stage"))
def decode_columns_device(sym, count, lit_len, lits, n_cmds, n_lits,
                          block_len, *, block_size: int,
                          interpret: bool = False,
                          stage: int = 3) -> jnp.ndarray:
    """Planar columns (device arrays) -> decoded [nb, block_size] uint8.

    One grid cell per block; see the module docstring.  ``stage`` is a
    profiling knob (0 = prep/IO, 1 = +paint, 2 = +scan, 3 = full decode).
    """
    nb, C = count.shape
    B = block_size
    assert B <= MAX_BLOCK, (B, MAX_BLOCK)
    assert B % ROW == 0, B
    R = B // ROW

    count = count.astype(jnp.int32)
    lit_len = lit_len.astype(jnp.int32)
    n_cmds = n_cmds.astype(jnp.int32)
    block_len = block_len.astype(jnp.int32)

    ev, pos, val = _event_stream(sym, count, lit_len, n_cmds)
    E = ev.shape[1]

    tri = jnp.asarray(np.tril(np.ones((ROW, ROW), np.float32)).T,
                      jnp.bfloat16)             # tri[p, j] = p <= j

    ERp = max(8, -(-E // (8 * ROW)) * 8)
    ev_rows = jnp.full((nb, ERp * ROW), _PAD_WORD, jnp.int32)
    ev_rows = jax.lax.dynamic_update_slice(ev_rows, ev, (0, 0))
    ev3 = ev_rows.reshape(nb, ERp, ROW)
    lw = lits.shape[1]
    lits_pad = (lits[:, :R * ROW] if lw >= R * ROW
                else jnp.pad(lits, ((0, 0), (0, R * ROW - lw))))
    lits3 = lits_pad.reshape(nb, R, ROW)

    # per-paint-group windows, computed here so the kernel's paint loop is
    # branch-on-scalar only (kernel docstring); events are handed to the
    # kernel pre-transposed per group ([G*128, groups])
    G = paint_group()
    ev4g = ev3.reshape(nb, ERp // G, G * ROW)
    evt = jnp.swapaxes(ev4g, 1, 2)                   # [nb, G*128, ERp//G]
    pos3 = jax.lax.shift_right_logical(ev4g, _POS_SHIFT)
    valid3 = pos3 < R * ROW
    live3 = jnp.any(valid3 & ((ev4g & _VAL_MASK) != _VAL_OFF), axis=-1)
    pmin = jnp.min(jnp.where(valid3, pos3, R * ROW), axis=-1)
    pmax = jnp.max(jnp.where(valid3, pos3, 0), axis=-1)
    W = paint_window_rows(R, G)
    r0 = jnp.clip((pmin >> 7) & ~7, 0, max(R - W, 0))
    full = (pmax >> 7) >= r0 + W
    code = jnp.where(~live3, _CODE_DEAD,
                     jnp.where(full, _CODE_FULL, r0)).astype(jnp.int32)

    kernel = functools.partial(_decode_body_flat, ERp=ERp, R=R,
                               interpret=interpret, stage=stage)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, G * ROW, ERp // G), lambda b, *_: (b, 0, 0)),
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
    )(code, block_len, evt, lits3, tri)
    return out.reshape(nb, B)


def decode_planar_sup(sym, count, lit_len, lits, n_cmds, n_lits, block_len,
                      *, block_size: int, interpret: bool = False):
    """Host-array convenience wrapper around the device entry point."""
    return decode_columns_device(
        jnp.asarray(np.asarray(sym, np.uint8)),
        jnp.asarray(np.asarray(count, np.int32)),
        jnp.asarray(np.asarray(lit_len, np.int32)),
        jnp.asarray(np.asarray(lits, np.uint8)),
        jnp.asarray(np.asarray(n_cmds, np.int32)),
        jnp.asarray(np.asarray(n_lits, np.int32)),
        jnp.asarray(np.asarray(block_len, np.int32)),
        block_size=block_size, interpret=interpret)

"""Flagship decode kernel: stripe-bucketed row-local event paint,
O(compressed) device input everywhere.

The whole pipeline is one jit:

    planar columns [nb, C] (device)  --XLA-->  event stream + stripe tables
                                     --Pallas-->  decoded bytes [nb, B]

so the host contribution to a decompress is only the container unpack; the
accelerator reads O(compressed) inputs and writes O(uncompressed) output,
like the reference decoder that touches only compressed bytes
(rle8_extreme_cpu.h:1825-1913) and the OpenCL device path that uploads the
payload only (rle8_ocl.c:335-348).

Representation.  Every run becomes two *events* in one position-sorted
stream (no sort needed -- runs are disjoint and commands are emitted in
order):

    open   at run_start:  value +(sym + 1)
    close  at run_end:    value -(sym + 1)

packed as ``pos << 10 | (value + 256)`` in one int32.

Row-local formulation.  Decompose every output position p = 128 r + l.
For an event at (er, el) with signed weight w = sign(value):

    cum(r, l)    = rowcum[r] + sum_{ev in row r, el <= l} value
    covbef(r, l) = cbr[r] + cov_state[r] * l + sum_{ev in row r} w relu(l - el)

where ``cum`` is the coverage value (0 => literal byte, v => run byte v - 1)
and ``covbef`` is the number of covered bytes before p (the literal
displacement).  Events affect only their own 128-byte row, so each is
painted as a *one-hot* (value / weight at its lane) by an MXU contraction,
and the in-row step/ramp prefix expansion is two [128, 128] constant
post-matmuls per block.  The cross-row carries (``rowcum``, ``cov_state``,
``cbr``) are three length-R vectors scanned log-step over a [1, R] vector.

Stripe bucketing.  The XLA prep distributes the sorted event stream into
columns of 128 slots such that every column's events live inside one
128-row stripe (dense stripes get several columns; the column budget
R/128 + ceil(E/128) always suffices).  Every paint is therefore an
unconditional 128-row windowed accumulate -- no data-dependent branch
exists in the kernel at all.  (The branchy variant this replaces -- paint
window chosen per group with a full-plane fallback -- serialized Mosaic's
instruction scheduling and cost ~30% of kernel time; XLA-side gathers for
the same redistribution lowered to per-element loops and cost 4x the whole
kernel.)  The slot -> event-index map is a staircase (non-decreasing,
increments in {0, 1}), so the kernel routes events into bucketed order
with a VMEM-resident log-step pull (ops/shuffle.staircase_pull) -- the
same primitive that places literal bytes.

Kernel stages (grid = one cell per block):

1. **route**: staircase-pull events into stripe-bucketed columns, one
   whole-plane transpose to column-major.
2. **paint**: per column, one-hot value/weight matrices contracted against
   a one-hot row-match matrix, accumulated into the column's stripe
   window (rotating accumulators decouple consecutive read-modify-writes);
   then the two constant step/ramp post-matmuls.
3. **carries**: three [1, R] log-step scans on lane-127 columns.
4. **literals**: ``staircase_pull`` places every literal byte at
   displacement ``covbef`` (the MEMCPY dual of rleX_extreme_common.h's
   memcpy walk).

Performance envelope (measured per stage on v5e via the ``stage`` knob;
the bench JSON publishes the table): run/symbol expansion is MXU-bound
and cheap (~134 cycles per 128-event column all-inclusive); the dominant
cost is stage 4, byte-exact *literal placement*.  A monotone per-byte
route on a machine without fast gather/scatter is a log2(B)-depth
roll+select network -- ~50 full-plane VPU ops however it is factored
(word-packing founders on Mosaic's lack of sub-32-bit rotates and lane
expansion for packed data; MXU permutation matmuls solve static byte
shuffles but not data-dependent per-byte shifts; coarse/fine splits
reproduce the same op count).  That pins this formulation's single-chip
decode near ~8 GB/s on DCT-like data: ~4x the fastest published CPU RLE
decoders of comparable ratio (trle 5.4 GB/s, README.md:64) and ~30% of
the reference's 27 GB/s, whose scalar loop rides a hardware byte-move
path TPUs do not expose.  Ratio, not byte speed, is where the container
wins (parallel/container.py FLAG_DEEP).
"""

from __future__ import annotations

import functools
import os

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
STRIPE = 128                # rows per stripe = paint window height
MAX_COLUMNS = 256           # event-column budget: beyond this the unrolled
                            # paint loop exceeds the chip's VMEM/compile
                            # budget; callers route denser blocks to XLA


def fits_kernel(block_size: int, capacity: int) -> bool:
    """Whether the fully-unrolled kernel is compilable for this geometry
    (block small enough, event-column count within MAX_COLUMNS)."""
    if block_size % ROW or block_size > MAX_BLOCK:
        return False
    ns = -(-(block_size // ROW) // STRIPE)
    nc = ns + -(-2 * capacity // ROW)
    return nc <= MAX_COLUMNS


def _jroll(x, s, axis):
    return jnp.roll(x, s, axis)


def _proll(x, s, axis):
    return pltpu.roll(x, s, axis=axis)


# ---------------------------------------------------------------------------
# XLA prep: planar columns -> event stream + stripe tables
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


def _row_scan_1xr(vec, R, roll):
    """Inclusive prefix sum of a [1, R] int32 vector by log-step rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    for bb in range(max(1, (R - 1).bit_length())):
        vec = vec + jnp.where(lane >= (1 << bb), roll(vec, 1 << bb, 1), 0)
    return vec


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _decode_body(code_ref, meta_ref, ev_ref, dp_ref, lits_ref,
                 out_ref, accv_ref, accv2_ref, accw_ref, accw2_ref,
                 *, NC: int, R: int, interpret: bool, stage: int = 3):
    """Whole-block body: grid = (nb,); see the module docstring.

    ``meta_ref[b] = blen | flags``: a block whose only command is one
    literal stretch (incompressible data, the memcpy control row) takes a
    single scalar branch straight to a masked copy of its literal plane;
    a block that is one whole-block run (sparse/zero data) broadcasts its
    symbol (the MEMSET analog).  Both skip routing / paint / carries /
    the literal staircase entirely."""
    roll = _jroll if interpret else _proll
    b = pl.program_id(0)
    meta = meta_ref[b]
    blen = meta & 0xFFFFF
    all_lit = (meta >> 20) & 1
    all_run = (meta >> 21) & 1
    sym0 = (meta >> 22) & 0xFF
    Wr = min(STRIPE, R)

    def write_masked(out):
        @pl.when(blen >= R * ROW)
        def _():
            out_ref[0] = out

        @pl.when(blen < R * ROW)
        def _():
            flat = (jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 0) * ROW
                    + jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 1))
            out_ref[0] = jnp.where(flat < blen, out, 0)

    @pl.when(all_lit == 1)
    def _():
        # mask-free copy: the gate requires n_lits == blen and the padded
        # literal plane is zero beyond n_lits, so the copied tail already
        # matches the masked-decode contract
        out_ref[0] = lits_ref[0]

    if R <= 1024:
        # the broadcast branch tips the 128 MiB VMEM budget at R = 2048
        # (the full body sits just under it); whole-block runs at larger
        # blocks take the normal path instead
        @pl.when(all_run == 1)
        def _():
            # gated to full blocks in the prep, so the broadcast needs no
            # tail mask (min(iota, 0) anchors a real vector layout)
            flat = (jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 0) * ROW
                    + jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 1))
            out_ref[0] = (jnp.minimum(flat, 0)
                          + (sym0 & 0xFF)).astype(jnp.uint8)

    @pl.when(all_lit + all_run == 0)
    def _():
        _decode_block(code_ref, ev_ref, dp_ref, lits_ref, out_ref,
                      accv_ref, accv2_ref, accw_ref, accw2_ref,
                      b, blen, roll, NC=NC, R=R, Wr=Wr, stage=stage)


def _decode_block(code_ref, ev_ref, dp_ref, lits_ref, out_ref,
                  accv_ref, accv2_ref, accw_ref, accw2_ref,
                  b, blen, roll, *, NC: int, R: int, Wr: int, stage: int):
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    subl128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, 1), 0)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROW, Wr), 1)
    dn = (((0,), (0,)), ((), ()))
    li = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 0)
    tri = (lane128 >= li).astype(jnp.bfloat16)              # [l >= el]
    rampm = jnp.maximum(lane128 - li, 0).astype(jnp.bfloat16)  # relu(l-el)

    accvs = (accv_ref, accv2_ref)
    accws = (accw_ref, accw2_ref)
    # bf16 accumulators: every per-cell partial sum is an integer within
    # +-256 (open/close pairs of adjacent runs bound the net), so bf16 is
    # exact and the zero-fill + read-modify-write traffic halves (the
    # f32 zero-fill alone was most of the fixed per-block cost at R=2048)
    for a in accvs + accws:
        a[...] = jnp.zeros((R, ROW), jnp.bfloat16)
    if stage == 0:                     # profiling: prep + launch + IO only
        out_ref[0] = jnp.full((R, ROW), blen & 0xFF, jnp.uint8)
        return

    # route events into stripe-bucketed column order (module docstring):
    # a VMEM-resident staircase pull over the [NC, 128] event plane, then
    # one transpose so each column is a [128, 1] sublane slice
    routed = shuffle.staircase_pull(ev_ref[0], dp_ref[0], roll)
    ev_t = jnp.swapaxes(routed, 0, 1)                       # [128, NC]

    for c in range(NC):
        cp = code_ref[b, c]
        r0 = pl.multiple_of(cp & 0xFFFF, 8)      # stripe start row
        lcnt = cp >> 16                          # live slots in the column
        # rotate accumulators so consecutive columns' read-modify-writes
        # don't serialize on one buffer (summed once after the loop)
        accv, accw = accvs[c % 2], accws[c % 2]

        e = ev_t[:, c:c + 1]                     # [128, 1] event words
        pos_c = jax.lax.shift_right_logical(e, _POS_SHIFT)
        live = (pos_c < R * ROW) & (subl128 < lcnt)
        vraw = jnp.where(live, (e & _VAL_MASK) - _VAL_OFF, 0)
        row_c = pos_c >> 7
        lane_c = pos_c & 127
        val_cbf = vraw.astype(jnp.bfloat16)
        w_cbf = jnp.sign(vraw).astype(jnp.bfloat16)

        # one-hot value/weight lane matrices + one-hot row match
        lm = (lane128 == lane_c).astype(jnp.bfloat16)
        bv = lm * val_cbf
        bw = lm * w_cbf
        rowm = (row_c - r0 == rows_iota).astype(jnp.bfloat16)
        mmv = jax.lax.dot_general(rowm, bv, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
        mmw = jax.lax.dot_general(rowm, bw, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
        if R <= STRIPE:
            accv[...] += mmv
            accw[...] += mmw
        else:
            accv[pl.ds(r0, Wr), :] += mmv
            accw[pl.ds(r0, Wr), :] += mmw

    painted_v = accv_ref[...] + accv2_ref[...]
    painted_w = accw_ref[...] + accw2_ref[...]
    # in-row step/ramp expansion: one [128, 128] constant contraction each
    mdn = (((1,), (0,)), ((), ()))
    step = jax.lax.dot_general(
        painted_v, tri, dimension_numbers=mdn,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    ramp = jax.lax.dot_general(
        painted_w, rampm, dimension_numbers=mdn,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    if stage == 1:                     # profiling: paint only
        out_ref[0] = (step & 0xFF).astype(jnp.uint8)
        return

    # carries: three [1, R] scans on the lane-127 columns (module docstring)
    rowdelta = jnp.swapaxes(step[:, ROW - 1:ROW], 0, 1)     # [1, R]
    incl = _row_scan_1xr(rowdelta, R, roll)
    excl = incl - rowdelta                                  # rowcum[r]
    cs = (excl >= 1).astype(jnp.int32)                      # cov_state[r]
    csn = (incl >= 1).astype(jnp.int32)                     # state after r
    ramp_tot = jnp.swapaxes(ramp[:, ROW - 1:ROW], 0, 1)
    c_row = ROW * cs + ramp_tot + (csn - cs)        # covered bytes in row r
    cbr_i = _row_scan_1xr(c_row, R, roll)
    cbr = jnp.swapaxes(cbr_i - c_row, 0, 1)                 # [R, 1]
    rowcum = jnp.swapaxes(excl, 0, 1)                       # [R, 1]
    cs_c = jnp.swapaxes(cs, 0, 1)                           # [R, 1]

    cum = rowcum + step
    cov = cum >= 1
    sym_exp = ((cum - 1) & 0xFF).astype(jnp.uint8)

    def write_out(out):
        # full blocks (the common case) skip the tail mask entirely
        @pl.when(blen >= R * ROW)
        def _():
            out_ref[0] = out

        @pl.when(blen < R * ROW)
        def _():
            flat = (jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 0) * ROW
                    + jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 1))
            out_ref[0] = jnp.where(flat < blen, out, 0)

    if stage == 2:                     # profiling: no literal movement
        write_out(sym_exp)
        return

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, ROW), 1)
    d_lit = cbr + cs_c * lane + ramp               # covered bytes before p
    lit_exp = shuffle.staircase_pull(
        lits_ref[0].astype(jnp.int32), d_lit, roll).astype(jnp.uint8)

    write_out(jnp.where(cov, sym_exp, lit_exp))


@functools.partial(jax.jit, static_argnames=("block_size", "interpret",
                                             "stage"))
def _decode_jit(sym, count, lit_len, lits, n_cmds, n_lits, block_len, *,
                block_size: int, interpret: bool, stage: int) -> jnp.ndarray:
    nb, C = count.shape
    B = block_size
    R = B // ROW

    count = count.astype(jnp.int32)
    lit_len = lit_len.astype(jnp.int32)
    n_cmds = n_cmds.astype(jnp.int32)
    block_len = block_len.astype(jnp.int32)

    ev, pos, val = _event_stream(sym, count, lit_len, n_cmds)
    E = ev.shape[1]

    lw = lits.shape[1]
    lits_pad = (lits[:, :R * ROW] if lw >= R * ROW
                else jnp.pad(lits, ((0, 0), (0, R * ROW - lw))))
    lits3 = lits_pad.reshape(nb, R, ROW)

    # --- stripe bucketing (module docstring): assign every live event to
    # a column of 128 slots inside its 128-row stripe; dense stripes get
    # multiple columns, and the budget ns + ceil(E/128) always suffices
    ns = -(-R // STRIPE)
    NC = ns + -(-E // ROW)
    live = (pos < R * ROW) & (val != 0)
    s_i = jnp.where(live, pos >> 14, ns)                     # row // 128
    sb = jnp.arange(ns, dtype=jnp.int32)
    cnt = jnp.sum((s_i[:, :, None] == sb[None, None, :]).astype(jnp.int32),
                  axis=1)                                    # [nb, ns]
    lo = jnp.cumsum(cnt, axis=1) - cnt
    ncols = -(-cnt // ROW)                                   # cols/stripe
    colstart = jnp.cumsum(ncols, axis=1) - ncols             # [nb, ns]
    cidx = jnp.arange(NC, dtype=jnp.int32)
    used = jnp.sum(ncols, axis=1, keepdims=True)             # [nb, 1]
    in_use = cidx[None, :] < used
    # stripe of column c = rightmost column-allocating stripe whose
    # colstart <= c (colstart is strictly increasing over those stripes,
    # so the max of qualifying stripe ids -- NOT the count of qualifiers,
    # which would give the rank among live stripes -- is the owner)
    s_of_c = jnp.max(jnp.where((colstart[:, :, None] <= cidx[None, None, :])
                               & (ncols[:, :, None] > 0),
                               sb[None, :, None], 0), axis=1)  # [nb, NC]
    s_of_c = jnp.clip(s_of_c, 0, ns - 1)
    lo_c = jnp.take_along_axis(lo, s_of_c, axis=1)
    st_c = jnp.take_along_axis(colstart, s_of_c, axis=1)
    cnt_c = jnp.take_along_axis(cnt, s_of_c, axis=1)
    base = lo_c + (cidx[None, :] - st_c) * ROW               # [nb, NC]
    lcnt = jnp.clip(cnt_c - (cidx[None, :] - st_c) * ROW, 0, ROW)
    lcnt = jnp.where(in_use, lcnt, 0)
    # slot -> event-index map, frozen at each stripe's end so it is
    # non-decreasing with increments in {0, 1}: a staircase, routed inside
    # the kernel with a VMEM-resident log-step pull (XLA gathers lower to
    # per-element loops on TPU: measured 4x the whole kernel's time)
    q = jnp.arange(ROW, dtype=jnp.int32)
    NCK = NC * ROW
    ev_idx = jnp.minimum(base[:, :, None] + q[None, None, :],
                         (lo_c + cnt_c)[:, :, None])         # [nb, NC, 128]
    slot = jnp.arange(NCK, dtype=jnp.int32)
    d_pull = (slot[None, :]
              - jnp.minimum(ev_idx.reshape(nb, NCK), NCK - 1))
    ev_src = jnp.full((nb, NCK), _PAD_WORD, jnp.int32)
    ev_src = jax.lax.dynamic_update_slice(ev_src, ev[:, :NCK], (0, 0))
    # stripe start row, 8-aligned with an 8-aligned clip bound (the Mosaic
    # alignment contract on the kernel's pl.ds; ADVICE r3), packed with
    # the column's live-slot count
    Wr = min(STRIPE, R)
    r0 = jnp.clip(jnp.where(in_use, s_of_c * STRIPE, 0),
                  0, max((R - Wr) & ~7, 0))
    code = (r0 | (lcnt << 16)).astype(jnp.int32)

    # fast-path flags (kernel docstring): all-literal = exactly one
    # command whose literal stretch spans the valid length; all-run = one
    # run command covering the whole valid length with no literals
    all_lit = ((n_cmds == 1)
               & (n_lits.astype(jnp.int32) == block_len)).astype(jnp.int32)
    all_run = ((n_cmds == 2) & (count[:, 0] == block_len)
               & (block_len == B)       # full blocks only: no tail mask
               & (lit_len[:, 0] == 0)
               & (lit_len[:, 1] == 0)).astype(jnp.int32)
    if R > 1024:                         # branch not emitted (see kernel)
        all_run = jnp.zeros_like(all_run)
    sym0 = sym[:, 0].astype(jnp.int32)
    meta = (block_len | (all_lit << 20) | (all_run << 21)
            | (jnp.where(all_run == 1, sym0, 0) << 22)).astype(jnp.int32)

    kernel = functools.partial(_decode_body, NC=NC, R=R,
                               interpret=interpret, stage=stage)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, NC, ROW), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, NC, ROW), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, ROW), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((R, ROW), jnp.bfloat16)] * 4,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, R, ROW), jnp.uint8),
        # the staircase keeps several [R, 128] i32 planes live at once; the
        # default 16 MiB scoped-vmem cap is too tight at large blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(code, meta, ev_src.reshape(nb, NC, ROW),
      d_pull.reshape(nb, NC, ROW), lits3)
    return out.reshape(nb, B)


def decode_columns_device(sym, count, lit_len, lits, n_cmds, n_lits,
                          block_len, *, block_size: int,
                          interpret: bool = False,
                          stage: int = 3) -> jnp.ndarray:
    """Planar columns (device arrays) -> decoded [nb, block_size] uint8.

    One grid cell per block; see the module docstring.  ``stage`` is a
    profiling knob (0 = prep/IO, 1 = +route+paint, 2 = +carries, 3 = full
    decode)."""
    B = block_size
    assert B <= MAX_BLOCK, (B, MAX_BLOCK)
    assert B % ROW == 0, B
    return _decode_jit(sym, count, lit_len, lits, n_cmds, n_lits, block_len,
                       block_size=block_size, interpret=interpret,
                       stage=stage)


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

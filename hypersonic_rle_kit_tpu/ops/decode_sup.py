"""Flagship decode kernel: stripe-bucketed event paint in word-major
coordinates + word-packed (4-bytes-per-lane) expansion, O(compressed)
device input everywhere.

The whole pipeline is one jit:

    planar columns [nb, C] (device)  --XLA-->  event stream + stripe tables
                                     --Pallas-->  decoded words [nb, B/4]

with the byte view of the output being a zero-cost host reinterpretation
(int32 little-endian = 4 output bytes), so the host contribution to a
decompress is only the container unpack; the accelerator reads
O(compressed) inputs and writes O(uncompressed) output, like the
reference decoder that touches only compressed bytes
(rle8_extreme_cpu.h:1825-1913) and the OpenCL device path that uploads
the payload only (rle8_ocl.c:335-348).

Representation.  Every run becomes two *events* in one position-sorted
stream (no sort needed -- runs are disjoint and commands are emitted in
order):

    open   at run_start:  value +(sym + 1)
    close  at run_end:    value -(sym + 1)

packed as ``pos << 10 | (value + 256)`` in one int32.

Word-packed formulation (round 5).  The r3/r4 kernels processed the
output plane one byte per 32-bit lane, which pinned them near ~8 GB/s:
the measured stage table had literal placement ~2.8 ms and paint ~3.0 ms
of 8.6 ms at 64 MiB.  Here output *word* q holds bytes 4q..4q+3 as a
[R4, 128] int32 plane (R4 = B/512).  Stages:

1. **route**: staircase-pull events into stripe-bucketed columns
   (ops/shuffle.staircase_pull on the event plane), batched over the grid
   cell's block group.
2. **paint, word-major**: per column, one one-hot *value* matrix over a
   512-lane axis (4 byte slots x 128 word lanes) contracted against a
   one-hot word-row match, accumulated into the column's 32-word-row
   stripe window of a [R4, 512] plane.  Slot-plane t of the accumulator
   IS the per-slot event paint, so the in-word prefixes P_t are three
   lane-slice adds -- no byte->word repacking exists anywhere.  (The
   first r5 formulation painted byte-major and resampled via sixteen
   [R4,128]x[128,128] matmuls: measured 8.5 ms -- small-matmul issue
   latency dominates; fusing to 4 matmuls still cost 2.1 ms.  Painting
   word-major makes the cost identical to r4's single value paint.)
   The r4 kernel also painted a parallel *weight* plane to derive
   literal displacements; the packed formulation derives them from
   coverage bits instead, halving paint matmuls and accumulator traffic.
3. **carries**: per-word in-row prefix via one triangular [128,128]
   matmul on the word totals, cross-row carry via a [1, R4] log-step
   scan (4x shorter than the r4 [1, R] scans); ``cum_t = carry + P_t``,
   coverage ``cov_t = cum_t >= 1``, run bytes ``sym_t = (cum_t-1) & 0xFF``.
4. **literals**: displacement ``d4`` (covered bytes before each word)
   comes from a second triangular-matmul scan over per-word coverage
   counts; ``dq = ceil(d4/4)`` is again a staircase on the *word* domain,
   so two shared-compare staircase pulls fetch the two source words
   straddling every destination word, and a 4-slot funnel extract
   (variable in-word shifts -- Mosaic has full i32 vector shifts) places
   each literal byte.  This replaces the r4 byte-plane staircase
   (log2(B) levels over [R, 128] planes) with log2(B/4) levels over
   [R/4, 128]: measured 0.66 ms vs 2.83 ms on the bench geometry.
   Verified against a brute-force model over 200 randomized geometries
   before porting.

Literal input is likewise consumed as int32 words ([4 bytes/lane]); the
host section slice is reinterpreted for free (np view).  XLA-side
``bitcast_convert_type`` was measured at 1.7-2.8 ms per direction at
64 MiB (minor-dim-4 relayouts) and is avoided on every hot path.

Exactness: every per-cell partial sum of event values lies in
[-256, 256] (runs are disjoint), so bf16 matmul inputs are exact and f32
accumulation is exact; per-word coverage counts are <= 4 so their in-row
prefix (<= 512) is exact in f32.
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
STRIPE = 128                # byte rows per stripe = 32 word rows
WR4 = 32                    # paint window height in word rows
MAX_COLUMNS = 256           # event-column budget: beyond this the unrolled
                            # paint loop exceeds the chip's VMEM/compile
                            # budget; callers route denser blocks to XLA


def fits_kernel(block_size: int, capacity: int) -> bool:
    """Whether the fully-unrolled kernel is compilable for this geometry
    (block small enough, event-column count within MAX_COLUMNS).

    ``block_size % 1024``: stripe paint windows are 8-aligned (the Mosaic
    alignment contract on pl.ds) and accumulator planes are padded to
    8-row multiples, so R4 = block_size/512 must divide evenly into the
    padded plane (ADVICE r4: silent corruption at e.g. block_size=16640);
    other geometries take the XLA decoder instead."""
    if block_size % (8 * ROW) or block_size > MAX_BLOCK:
        return False
    ns = -(-(block_size // ROW) // STRIPE)
    nc = ns + -(-2 * capacity // ROW)
    return nc <= MAX_COLUMNS


def _jroll(x, s, axis):
    return jnp.roll(x, s, axis)


def _proll(x, s, axis):
    return pltpu.roll(x, s, axis=axis)


def lits_to_words(lits: np.ndarray) -> np.ndarray:
    """Host-side zero-copy reinterpretation of a [nb, L] uint8 literal
    section (L % 4 == 0) as [nb, L/4] little-endian int32 words -- the
    kernel's literal input format."""
    assert lits.dtype == np.uint8 and lits.shape[1] % 4 == 0, lits.shape
    return np.ascontiguousarray(lits).view(np.int32)


def words_to_bytes(words: np.ndarray) -> np.ndarray:
    """Host-side zero-copy view of [nb, W] int32 decode output as
    [nb, 4W] bytes."""
    return np.ascontiguousarray(words).view(np.uint8)


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
    """Inclusive prefix sum of a [..., 1, R] int32 vector by log-step
    rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, vec.shape, vec.ndim - 1)
    for bb in range(max(1, (R - 1).bit_length())):
        vec = vec + jnp.where(lane >= (1 << bb),
                              roll(vec, 1 << bb, vec.ndim - 1), 0)
    return vec


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _staircase_pull2(a, b, d, roll):
    """Two staircase pulls sharing one displacement: y[p] = x[p - d[p]]
    for both arrays with a single bit-walk of ``d`` (ops/shuffle.py
    staircase contract: d >= 0, src steps in {0, 1})."""
    R = a.shape[-2]
    nbits = (R * ROW - 1).bit_length()
    ds = d << (32 - nbits)
    for bb in reversed(range(nbits)):
        sa = shuffle.flat_roll(a, 1 << bb, roll)
        sb = shuffle.flat_roll(b, 1 << bb, roll)
        take = ds < 0
        a = jnp.where(take, sa, a)
        b = jnp.where(take, sb, b)
        ds = ds << 1
    return a, b


def _decode_body(code_ref, meta_ref, ev_ref, dp_ref, litw_ref,
                 out_ref, accv_ref, accv2_ref,
                 *, NC: int, R4: int, R4p: int, G: int, interpret: bool,
                 stage: int = 3):
    """Whole-group body: grid = (nb / G,); see the module docstring.

    ``meta_ref[b] = blen | flags``: a block whose only command is one
    literal stretch (incompressible data, the memcpy control row) takes a
    single scalar branch straight to a copy of its literal word plane; a
    block that is one whole-block run (sparse/zero data) broadcasts its
    replicated symbol word (the MEMSET analog).  Both skip routing /
    paint / scans / the literal pull entirely."""
    roll = _jroll if interpret else _proll
    cell = pl.program_id(0)
    B = R4 * 4 * ROW

    # hoisted constants (shared by every block of the group)
    lane512 = jax.lax.broadcasted_iota(jnp.int32, (ROW, 4 * ROW), 1)
    subl128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, 1), 0)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (ROW, WR4), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 0)
    tri = (lane128 >= li).astype(jnp.bfloat16)          # in-row prefix
    dn = (((0,), (0,)), ((), ()))
    mdn = (((1,), (0,)), ((), ()))
    flatw = (jax.lax.broadcasted_iota(jnp.int32, (R4, ROW), 0) * ROW
             + jax.lax.broadcasted_iota(jnp.int32, (R4, ROW), 1))
    consts = (lane512, subl128, rows_iota, tri, dn, mdn, flatw)

    # route all G blocks' events in one batched pull (amortizes the
    # latency-bound small-plane ops across the group)
    if stage >= 1:
        routed_all = shuffle.staircase_pull(ev_ref[...], dp_ref[...], roll)

    for g in range(G):
        b = cell * G + g
        meta = meta_ref[b]
        blen = meta & 0xFFFFF
        all_lit = (meta >> 20) & 1
        all_run = (meta >> 21) & 1
        sym0 = (meta >> 22) & 0xFF

        def write_masked(out, blen=blen, g=g):
            @pl.when(blen >= B)
            def _():
                out_ref[g] = out

            @pl.when(blen < B)
            def _():
                nf = jnp.clip(blen - 4 * flatw, 0, 4)
                pm = (1 << (jnp.minimum(nf, 3) * 8)) - 1
                out_ref[g] = jnp.where(nf >= 4, out, out & pm)

        @pl.when(all_lit == 1)
        def _(g=g):
            # mask-free copy: the gate requires n_lits == blen and the
            # padded literal plane is zero beyond n_lits, so the copied
            # tail already matches the masked-decode contract
            out_ref[g] = litw_ref[g]

        @pl.when(all_run == 1)
        def _(g=g, sym0=sym0):
            # gated to full blocks in the prep, so the broadcast needs no
            # tail mask (min(iota, 0) anchors a real vector layout)
            out_ref[g] = (jnp.minimum(flatw, 0)
                          + sym0 * jnp.int32(0x01010101))

        @pl.when(all_lit + all_run == 0)
        def _(g=g, b=b, blen=blen, write_masked=write_masked):
            _decode_block(
                code_ref, routed_all[g] if stage >= 1 else None,
                litw_ref, out_ref, accv_ref, accv2_ref,
                g, b, blen, write_masked, roll,
                NC=NC, R4=R4, R4p=R4p, stage=stage, consts=consts)


def _decode_block(code_ref, routed, litw_ref, out_ref, accv_ref, accv2_ref,
                  g, b, blen, write_masked, roll,
                  *, NC: int, R4: int, R4p: int, stage: int, consts):
    (lane512, subl128, rows_iota, tri, dn, mdn, flatw) = consts
    B = R4 * 4 * ROW

    accvs = (accv_ref, accv2_ref)
    # bf16 accumulators: every per-cell partial sum is an integer within
    # +-256 (open/close pairs of adjacent runs bound the net), so bf16 is
    # exact and the zero-fill + read-modify-write traffic halves
    for a in accvs:
        a[...] = jnp.zeros((R4p, 4 * ROW), jnp.bfloat16)
    if stage == 0:                     # profiling: prep + launch + IO only
        out_ref[g] = jnp.full((R4, ROW), blen, jnp.int32)
        return

    ev_t = jnp.swapaxes(routed, 0, 1)                       # [128, NC]

    for c in range(NC):
        cp = code_ref[b, c]
        r0 = pl.multiple_of(cp & 0xFFFF, 8)      # stripe start word-row
        lcnt = cp >> 16                          # live slots in the column
        # rotate accumulators so consecutive columns' read-modify-writes
        # don't serialize on one buffer (summed once after the loop)
        accv = accvs[c % 2]

        e = ev_t[:, c:c + 1]                     # [128, 1] event words
        pos_c = jax.lax.shift_right_logical(e, _POS_SHIFT)
        live = (pos_c < B) & (subl128 < lcnt)
        vraw = jnp.where(live, (e & _VAL_MASK) - _VAL_OFF, 0)
        # word-major paint coordinates: byte p -> word row p >> 9, paint
        # lane (slot << 7) | word-lane = (p & 3) * 128 + ((p >> 2) & 127)
        rowq_c = pos_c >> 9
        lane_c = ((pos_c & 3) << 7) | ((pos_c >> 2) & 127)
        val_cbf = vraw.astype(jnp.bfloat16)

        # compare/astype/mul (NOT jnp.where: a [128,512] i1 where hits a
        # Mosaic "invalid relayout" compile failure on v5e)
        bv = (lane512 == lane_c).astype(jnp.bfloat16) * val_cbf
        rowm = (rowq_c - r0 == rows_iota).astype(jnp.bfloat16)
        mmv = jax.lax.dot_general(rowm, bv, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
        if R4p <= WR4:
            accv[...] += mmv
        else:
            accv[pl.ds(r0, WR4), :] += mmv

    painted = accv_ref[...] + accv2_ref[...]            # [R4p, 512] bf16
    if stage == 1:                     # profiling: route + paint only
        out_ref[g] = painted[:R4, :ROW].astype(jnp.int32)
        return

    # in-word prefixes: slot-plane t of the paint is the per-slot event
    # sum, so P_t is three adds of static lane slices (module docstring)
    V = [painted[:, t * ROW:(t + 1) * ROW] for t in range(4)]
    P1 = V[0] + V[1]
    P2 = P1 + V[2]
    T = P2 + V[3]                                       # in-word total
    Pt = [V[0], P1, P2, T]

    # carries: in-row prefix via one triangular matmul, cross-row carry
    # via a [1, R4p] log-step scan
    TS = jax.lax.dot_general(T, tri, dimension_numbers=mdn,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)
    Ti = T.astype(jnp.int32)
    rowtot = TS[:, ROW - 1:ROW]                             # [R4p, 1]
    incl = _row_scan_1xr(jnp.swapaxes(rowtot, 0, 1), R4p, roll)
    carry = jnp.swapaxes(incl - jnp.swapaxes(rowtot, 0, 1), 0, 1)
    WC = carry + TS - Ti                    # event-value prefix before word
    cum = [WC + Pt[t].astype(jnp.int32) for t in range(4)]
    cov = [c >= 1 for c in cum]
    sym_t = [(c - 1) & 0xFF for c in cum]

    # literal displacement: covered bytes before each word's first byte
    cnt_w = (cov[0].astype(jnp.int32) + cov[1] + cov[2] + cov[3])
    CS = jax.lax.dot_general(cnt_w.astype(jnp.bfloat16), tri,
                             dimension_numbers=mdn,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)
    crt = CS[:, ROW - 1:ROW]
    cincl = _row_scan_1xr(jnp.swapaxes(crt, 0, 1), R4p, roll)
    ccarry = jnp.swapaxes(cincl - jnp.swapaxes(crt, 0, 1), 0, 1)
    d4 = ccarry + CS - cnt_w
    if stage == 2:                     # profiling: no literal movement
        write_masked((sym_t[0] | (d4 << 8))[:R4])
        return

    # coarse word route: dq = ceil(d4/4) is a staircase on the word
    # domain; pull the two straddling source words with one shared bit-walk
    dq = (d4 + 3) >> 2
    pad4 = (dq << 2) - d4                                   # (-d4) mod 4
    litw = litw_ref[g]
    if R4p != R4:
        litw = jnp.concatenate(
            [litw, jnp.zeros((R4p - R4, ROW), jnp.int32)], axis=0)
    nxt = shuffle.flat_roll(litw, -1, roll)                 # litw[j + 1]
    wA, wB = _staircase_pull2(litw, nxt, dq, roll)

    # fine: per-slot funnel extract + run/literal merge
    out = jnp.zeros((R4p, ROW), jnp.int32)
    pc = jnp.zeros((R4p, ROW), jnp.int32)
    for t in range(4):
        s = t + pad4 - pc                    # source byte offset in wA|wB
        w = jnp.where(s >= 4, wB, wA)
        byte = jax.lax.shift_right_logical(w, (s & 3) * 8) & 0xFF
        m = jnp.where(cov[t], sym_t[t], byte)
        out = out | (m << (8 * t))
        pc = pc + cov[t].astype(jnp.int32)

    write_masked(out[:R4])


@functools.partial(jax.jit, static_argnames=("block_size", "interpret",
                                             "stage", "out_words"))
def _decode_jit(sym, count, lit_len, lits, n_cmds, n_lits, block_len, *,
                block_size: int, interpret: bool, stage: int,
                out_words: bool) -> jnp.ndarray:
    nb, C = count.shape
    B = block_size
    R = B // ROW
    R4 = B // 512
    R4p = max(-(-R4 // 8) * 8, WR4)

    count = count.astype(jnp.int32)
    lit_len = lit_len.astype(jnp.int32)
    n_cmds = n_cmds.astype(jnp.int32)
    block_len = block_len.astype(jnp.int32)

    ev, pos, val = _event_stream(sym, count, lit_len, n_cmds)
    E = ev.shape[1]

    if lits.dtype == jnp.uint8:
        # compatibility path (tests, ad-hoc callers): XLA bitcast of the
        # byte stream; hot paths ship int32 words (lits_to_words) because
        # this relayout measured 2.8 ms at 64 MiB
        lw = lits.shape[1]
        lits_pad = (lits[:, :B] if lw >= B
                    else jnp.pad(lits, ((0, 0), (0, B - lw))))
        litw = jax.lax.bitcast_convert_type(
            lits_pad.reshape(nb, R4 * ROW, 4), jnp.int32)
    else:
        assert lits.dtype == jnp.int32, lits.dtype
        lw = lits.shape[1]
        litw = (lits[:, :R4 * ROW] if lw >= R4 * ROW
                else jnp.pad(lits, ((0, 0), (0, R4 * ROW - lw))))
    litw = litw.reshape(nb, R4, ROW)

    # --- stripe bucketing (module docstring): assign every live event to
    # a column of 128 slots inside its 128-byte-row stripe; dense stripes
    # get multiple columns, and the budget ns + ceil(E/128) always suffices
    ns = -(-R // STRIPE)
    NC = ns + -(-E // ROW)
    live = (pos < B) & (val != 0)
    s_i = jnp.where(live, pos >> 14, ns).astype(jnp.int32)   # byte row//128
    sb = jnp.arange(ns, dtype=jnp.int32)
    # lane-minor one-hot reduce ([nb, ns, E] with E on the lane axis)
    cnt = jnp.sum((s_i[:, None, :] == sb[None, :, None]).astype(jnp.int32),
                  axis=2)                                    # [nb, ns]
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
    # stripe start word-row (32 word rows per stripe), 8-aligned: stripe
    # starts are multiples of 32 and the padded-plane clip bound R4p-32
    # is a multiple of 8, so the window always covers the last rows
    # (ADVICE r4), packed with the column's live-slot count
    r0 = jnp.clip(jnp.where(in_use, s_of_c * WR4, 0), 0, max(R4p - WR4, 0))
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
    sym0 = sym[:, 0].astype(jnp.int32)
    meta = (block_len | (all_lit << 20) | (all_run << 21)
            | (jnp.where(all_run == 1, sym0, 0) << 22)).astype(jnp.int32)

    # group blocks per grid cell: batches the route pull and amortizes the
    # latency-bound small-plane scans across G blocks
    G = 4 if nb >= 4 else 1
    nbp = -(-nb // G) * G
    if nbp != nb:
        padb = nbp - nb
        # pad blocks decode as all-literal zero-length: one cheap copy
        meta = jnp.concatenate([meta, jnp.full(padb, 1 << 20, jnp.int32)])
        code = jnp.pad(code, ((0, padb), (0, 0)))
        ev_src = jnp.pad(ev_src, ((0, padb), (0, 0)),
                         constant_values=_PAD_WORD)
        d_pull = jnp.pad(d_pull, ((0, padb), (0, 0)))
        litw = jnp.pad(litw, ((0, padb), (0, 0), (0, 0)))

    kernel = functools.partial(_decode_body, NC=NC, R4=R4, R4p=R4p, G=G,
                               interpret=interpret, stage=stage)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbp // G,),
        in_specs=[
            pl.BlockSpec((G, NC, ROW), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((G, NC, ROW), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((G, R4, ROW), lambda c, *_: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, R4, ROW), lambda c, *_: (c, 0, 0)),
        scratch_shapes=[pltpu.VMEM((R4p, 4 * ROW), jnp.bfloat16)] * 2,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbp, R4, ROW), jnp.int32),
        # the pulls keep several [R4, 128] i32 planes live at once; the
        # default 16 MiB scoped-vmem cap is too tight at large blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(code, meta, ev_src.reshape(nbp, NC, ROW),
      d_pull.reshape(nbp, NC, ROW), litw)
    out = out[:nb].reshape(nb, R4 * ROW)
    if out_words:
        return out
    outb = jax.lax.bitcast_convert_type(
        out.reshape(nb, R4 * ROW, 1), jnp.uint8)    # compat path: bytes
    return outb.reshape(nb, B)


def decode_columns_device(sym, count, lit_len, lits, n_cmds, n_lits,
                          block_len, *, block_size: int,
                          interpret: bool = False,
                          stage: int = 3,
                          out_words: bool = False) -> jnp.ndarray:
    """Planar columns (device arrays) -> decoded [nb, block_size] uint8
    (or [nb, block_size/4] int32 words with ``out_words``, the hot-path
    form whose byte view is free on the host -- words_to_bytes).

    ``lits`` may be [nb, L] uint8 (compatibility; converted with an XLA
    bitcast) or [nb, L/4] int32 words (hot path; see lits_to_words).
    ``stage`` is a profiling knob (0 = prep/IO, 1 = +route+paint,
    2 = +prefixes+carries, 3 = full decode)."""
    B = block_size
    assert B <= MAX_BLOCK, (B, MAX_BLOCK)
    # stripe windows are 8-aligned; see fits_kernel (ADVICE r4)
    assert B % (8 * ROW) == 0, B
    return _decode_jit(sym, count, lit_len, lits, n_cmds, n_lits, block_len,
                       block_size=block_size, interpret=interpret,
                       stage=stage, out_words=out_words)


def decode_planar_sup(sym, count, lit_len, lits, n_cmds, n_lits, block_len,
                      *, block_size: int, interpret: bool = False):
    """Host-array convenience wrapper around the device entry point."""
    lits = np.asarray(lits, np.uint8)
    litw = (lits_to_words(lits) if lits.ndim == 2 and lits.shape[1] % 4 == 0
            else lits)
    return decode_columns_device(
        jnp.asarray(np.asarray(sym, np.uint8)),
        jnp.asarray(np.asarray(count, np.int32)),
        jnp.asarray(np.asarray(lit_len, np.int32)),
        jnp.asarray(litw),
        jnp.asarray(np.asarray(n_cmds, np.int32)),
        jnp.asarray(np.asarray(n_lits, np.int32)),
        jnp.asarray(np.asarray(block_len, np.int32)),
        block_size=block_size, interpret=interpret)

"""Flagship decode kernel: stripe-bucketed boundary-descriptor paint +
word-packed (4-bytes-per-lane) expansion, O(compressed) device input.

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
2. **paint, two word-level channels**: per column of <=128 events, a
   one-hot lane matrix contracted against a one-hot word-row match over
   the column's 128-word-row (64 KiB) stripe window -- full [128,128,128]
   MXU tiles, no M/N padding -- accumulated into
     T: signed event values summed per word, and
     D: a boundary descriptor (open slot + 1) + 8 * (close slot + 1).
   Because every emitted run spans >= 4 bytes (the kernel's *min-run
   contract*, enforced by api/ref_device callers), run starts are >= 4
   apart and run ends are >= 4 apart, so **at most one open and one close
   land in any word** and D decodes unambiguously.  (The first r5
   formulation painted per-byte-slot planes over 512 lanes: the M=32
   window wasted 3/4 of the MXU and the 512-lane one-hot build cost ~4x;
   an alternative that resampled byte-major paint through sixteen
   [R4,128]x[128,128] matmuls measured 8.5 ms of matmul-issue latency.)
3. **carries**: in-row prefix of T via one triangular matmul (G blocks
   stacked along M), cross-row carry via [G, 1, R4] log-step scans ->
   ``WC`` = event-value prefix before each word; a running value >= 1
   means the word starts inside a run of symbol ``WC - 1``.
4. **SWAR word decode**: per-word coverage is two *contiguous* nibble
   masks (incoming-run prefix [0, tc), new-run suffix [to, 4)) resolved
   from D by 4-bit shift-LUT constants; the literal bytes of a word are
   one contiguous stream window, so after the coarse pull a **single
   funnel shift** places them, and the output word is assembled with
   nibble->byte mask expansion (shift/add forms only -- 32-bit vector
   multiplies are multi-op on the VPU).  Verified against a brute-force
   model over 300 randomized geometries before porting.
5. **literal coarse route**: displacement ``d4`` (covered bytes before
   each word) comes from a second triangular-matmul scan over per-word
   coverage counts; ``dq = ceil(d4/4)`` is again a staircase on the
   *word* domain, so two shared-compare staircase pulls fetch the two
   source words straddling every destination word.  This replaces the r4
   byte-plane staircase (log2(B) levels over [R, 128] planes) with
   log2(B/4) levels over [R/4, 128] planes: measured 0.9 ms vs 2.83 ms
   on the bench geometry.

Literal input is likewise consumed as int32 words (4 bytes/lane); the
host section slice is reinterpreted for free (np view).  XLA-side
``bitcast_convert_type`` was measured at 1.7-2.8 ms per direction at
64 MiB (minor-dim-4 relayouts) and is avoided on every hot path.

The paint loop runs as a fori_loop over quad groups (_QUAD same-stripe
columns stacked along the contracting axis per dot pair — the
per-column 128^3 dots were MXU *issue*-bound, ~4.4 ms of the 6.9 ms r5-C
kernel for a ~0.7 ms FLOP roofline; quads cut dot issues 4x for the same
MACs and took route+paint to ~0.9 ms).  The r4/early-r5 full unroll of
G x NC column bodies compiled for 17-78 s and capped MAX_COLUMNS
(VERDICT r4 #7); a fully-rolled per-pair loop lost cross-column software
pipelining, so each step unrolls _UNROLL/_QUAD quads with static
rotating-accumulator targets, and empty columns (capacity padding,
sparse blocks) skip all painting work via the per-block trip count.

Exactness: every per-cell partial sum of event values lies in
[-256, 256] (runs are disjoint), so bf16 matmul inputs are exact and f32
accumulation is exact; per-word coverage counts are <= 4 so their in-row
prefix (<= 512) is exact in f32.
"""

from __future__ import annotations

import functools
import os as _os

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
WQ = int(_os.environ.get("HSRK_DECODE_WQ", "128"))  # paint window word rows
STRIPE_BYTES = WQ * 512     # bytes per stripe
MAX_COLUMNS = 512           # event-column budget (VMEM for the event
                            # scratch); callers route denser blocks to XLA
_GROUP = int(_os.environ.get("HSRK_DECODE_G", "4"))   # blocks per grid cell
_UNROLL = int(_os.environ.get("HSRK_DECODE_UNROLL", "16"))  # columns/step
# columns contracted per matmul pair (round 5): the per-column 128^3 paint
# matmuls were issue-bound (fill/drain per dot dominated; ~134 dots per
# dense 256 KiB block), so Q same-stripe columns stack along the
# contracting axis into one [WQ, Q*128] x [128, Q*128] dot pair, 4x fewer
# issues for the same MACs.  Each stripe's column allocation is padded to
# a Q multiple so every quad is stripe-pure (shares one window start).
_QUAD = int(_os.environ.get("HSRK_DECODE_Q", "4"))
MIN_RUN = 4                 # the boundary-descriptor min-run contract


def fits_kernel(block_size: int, capacity: int) -> bool:
    """Whether the kernel supports this geometry (block small enough,
    event-column count within MAX_COLUMNS).

    ``block_size % 1024``: stripe paint windows are 8-aligned (the Mosaic
    alignment contract on pl.ds) and accumulator planes are padded to
    8-row multiples, so R4 = block_size/512 must divide evenly into the
    padded plane (ADVICE r4: silent corruption at e.g. block_size=16640);
    other geometries take the XLA decoder instead.

    Callers must also guarantee the min-run contract: every emitted run
    spans >= MIN_RUN bytes (HRT1 containers enforce min_count >= 4;
    ref_device checks parsed counts)."""
    if block_size % (8 * ROW) or block_size > MAX_BLOCK:
        return False
    ns = -(-block_size // STRIPE_BYTES)
    nc = ns * _QUAD + -(-2 * capacity // ROW)
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


@functools.partial(jax.jit, static_argnames=("w",))
def interleave_words(yw: jnp.ndarray, *, w: int) -> jnp.ndarray:
    """Width re-interleave in the word domain: [nb, B/4] int32 words of
    the lane-major (de-interleaved) decode output -> [nb, B/4] words of
    the original byte stream (``out[p] = plane[p % w, p // w]``), built
    from static lane slices + shift/mask byte composition -- no
    byte-level bitcast or transpose relayout (measured 1.7-2.8 ms per
    direction at 64 MiB).  Requires ``w % 4 == 0`` (the 32/64/128-bit
    families); 16/24/48-bit callers use the byte-plane transpose.
    This is the once-per-stream HBM analog of the reference's staggered
    per-iteration broadcasts (rle24_extreme_cpu_decode.h:30-55)."""
    assert w % 4 == 0, w
    nb, W = yw.shape
    B = W * 4
    WG = B // (4 * w)                       # words per lane
    lwt = jnp.swapaxes(yw.reshape(nb, w, WG), 1, 2)     # [nb, WG, w]
    parts = []
    for b in range(4):                      # byte slot within lane word
        row = []
        for p in range(w // 4):             # out-word group within symbol
            v = None
            for j in range(4):
                byte = (jax.lax.shift_right_logical(
                    lwt[:, :, 4 * p + j], 8 * b) & 0xFF) << (8 * j)
                v = byte if v is None else v | byte
            row.append(v)
        parts.append(jnp.stack(row, axis=-1))           # [nb, WG, w/4]
    out = jnp.stack(parts, axis=-2)                     # [nb, WG, 4, w/4]
    return out.reshape(nb, W)


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


def _decode_body(code_ref, meta_ref, ucols_ref, ev_ref, dp_ref, litw_ref,
                 out_ref, accT_ref, accT2_ref, accD_ref, accD2_ref,
                 evs_ref,
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

    Q = _QUAD
    QK = Q * ROW
    # hoisted constants (shared by every block of the group)
    lane_qk = jax.lax.broadcasted_iota(jnp.int32, (1, QK), 1)
    rows_iota_q = jax.lax.broadcasted_iota(jnp.int32, (WQ, QK), 0)
    sub_qk = jax.lax.broadcasted_iota(jnp.int32, (ROW, QK), 0)
    dnq = (((1,), (1,)), ((), ()))      # contract on lanes of both operands
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 0)
    tri = (lane128 >= li).astype(jnp.bfloat16)          # in-row prefix
    mdn = (((1,), (0,)), ((), ()))
    flatw = (jax.lax.broadcasted_iota(jnp.int32, (R4, ROW), 0) * ROW
             + jax.lax.broadcasted_iota(jnp.int32, (R4, ROW), 1))

    for a in (accT_ref, accT2_ref, accD_ref, accD2_ref):
        a[...] = jnp.zeros((G, R4p, ROW), jnp.bfloat16)

    if stage == 0:                     # profiling: prep + launch + IO only
        for g in range(G):
            out_ref[g] = jnp.full((R4, ROW), meta_ref[cell * G + g],
                                  jnp.int32)
        return

    # route all G blocks' events in one batched pull (amortizes the
    # latency-bound small-plane ops across the group); the quad-lane
    # reshape ([NC, 128] -> [NC/Q, Q*128]) lets each paint step consume
    # its Q columns as one contiguous lane row with no per-quad relayout
    evs_ref[...] = shuffle.staircase_pull(
        ev_ref[...], dp_ref[...], roll).reshape(G, NC // Q, QK)

    # ---- per-block paint: two word-level channels (module docstring) ----
    for g in range(G):
        b = cell * G + g

        def _paint_quad(accT, accD, qi, g=g, b=b):
            c0 = qi * Q
            cp0 = code_ref[b, c0]
            r0 = pl.multiple_of(cp0 & 0xFFFF, 8)  # stripe start word-row
            lcv = jnp.full((1, QK), cp0 >> 16, jnp.int32)
            for j in range(1, Q):               # live slots per column
                lcv = jnp.where(lane_qk >= j * ROW,
                                code_ref[b, c0 + j] >> 16, lcv)

            e = evs_ref[g, pl.ds(qi, 1), :]     # [1, Q*128]
            pos_c = jax.lax.shift_right_logical(e, _POS_SHIFT)
            live = (pos_c < B) & ((lane_qk & (ROW - 1)) < lcv)
            vraw = jnp.where(live, (e & _VAL_MASK) - _VAL_OFF, 0)
            slot_c = pos_c & 3
            rowq_c = pos_c >> 9
            lane_c = (pos_c >> 2) & 127
            desc = jnp.where(vraw > 0, slot_c + 1,
                             jnp.where(vraw < 0, (slot_c + 1) * 8, 0))

            # values ride the window operand; the lane one-hot is shared
            rowm = (rowq_c - r0 == rows_iota_q).astype(jnp.bfloat16)
            rvT = rowm * vraw.astype(jnp.bfloat16)      # [WQ, Q*128]
            rvD = rowm * desc.astype(jnp.bfloat16)
            oh = (sub_qk == lane_c).astype(jnp.bfloat16)  # [128, Q*128]
            mmT = jax.lax.dot_general(
                rvT, oh, dimension_numbers=dnq,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            mmD = jax.lax.dot_general(
                rvD, oh, dimension_numbers=dnq,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            if R4p <= WQ:
                accT[g] += mmT
                accD[g] += mmD
            else:
                accT[g, pl.ds(r0, WQ), :] += mmT
                accD[g, pl.ds(r0, WQ), :] += mmD

        def group_body(i, _):
            # rotating accumulators with static ref targets decouple
            # consecutive quads' read-modify-writes
            for half in range(_UNROLL // Q):
                if half % 2 == 0:
                    _paint_quad(accT_ref, accD_ref,
                                (_UNROLL // Q) * i + half)
                else:
                    _paint_quad(accT2_ref, accD2_ref,
                                (_UNROLL // Q) * i + half)
            return 0

        # trip count bounded by this block's used columns: trailing empty
        # columns (capacity padding, sparse blocks) cost nothing, without
        # a per-column scalar branch (a pl.when guard serialized Mosaic's
        # column pipelining: measured paint 5.4 -> 9.1 ms)
        ng = (ucols_ref[b] + _UNROLL - 1) // _UNROLL
        jax.lax.fori_loop(0, ng, group_body, 0)

    T4 = (accT_ref[...] + accT2_ref[...])               # [G, R4p, 128] bf16
    D4 = (accD_ref[...] + accD2_ref[...]).astype(jnp.int32)
    if stage == 1:                     # profiling: route + paint only
        for g in range(G):
            out_ref[g] = (T4[g, :R4].astype(jnp.int32) | D4[g, :R4])
        return

    # ---- batched word decode (all G blocks at once) ----
    Ti = T4.astype(jnp.int32)
    TSf = jax.lax.dot_general(T4.reshape(G * R4p, ROW), tri,
                              dimension_numbers=mdn,
                              preferred_element_type=jnp.float32)
    TS = TSf.astype(jnp.int32).reshape(G, R4p, ROW)
    rowtot = TS[:, :, ROW - 1:ROW]                          # [G, R4p, 1]
    incl = _row_scan_1xr(jnp.swapaxes(rowtot, 1, 2), R4p, roll)
    carry = jnp.swapaxes(incl - jnp.swapaxes(rowtot, 1, 2), 1, 2)
    WC = carry + TS - Ti                # event-value prefix before word

    # SWAR word decode (module docstring stage 4)
    o1 = D4 & 7                         # open slot + 1 (0 = no open)
    c1 = jax.lax.shift_right_logical(D4, 3) & 7   # close slot + 1
    mask_new = jax.lax.shift_right_logical(0x8CEF0, o1 << 2) & 0xF
    run_in = (WC >= 1).astype(jnp.int32)
    mask_in = jnp.where(
        run_in > 0,
        jax.lax.shift_right_logical(0x7310F, c1 << 2) & 0xF, 0)
    cov4 = mask_in | mask_new
    pcin = jnp.where(run_in > 0, jnp.where(c1 > 0, c1 - 1, 4), 0)
    cnt_w = pcin + jnp.where(o1 > 0, 5 - o1, 0)

    # literal displacement: covered bytes before each word's first byte
    CSf = jax.lax.dot_general(cnt_w.astype(jnp.bfloat16)
                              .reshape(G * R4p, ROW), tri,
                              dimension_numbers=mdn,
                              preferred_element_type=jnp.float32)
    CS = CSf.astype(jnp.int32).reshape(G, R4p, ROW)
    crt = CS[:, :, ROW - 1:ROW]
    cincl = _row_scan_1xr(jnp.swapaxes(crt, 1, 2), R4p, roll)
    ccarry = jnp.swapaxes(cincl - jnp.swapaxes(crt, 1, 2), 1, 2)
    d4 = ccarry + CS - cnt_w

    if stage >= 3:
        # coarse word route: dq = ceil(d4/4) is a staircase on the word
        # domain; pull the two straddling source words with one shared
        # bit-walk, batched over the group
        dq = (d4 + 3) >> 2
        pad4 = (dq << 2) - d4                               # (-d4) mod 4
        litw = litw_ref[...]
        if R4p != R4:
            litw = jnp.concatenate(
                [litw, jnp.zeros((G, R4p - R4, ROW), jnp.int32)], axis=1)
        nxt = shuffle.flat_roll(litw, -1, roll)             # litw[j + 1]
        wA, wB = _staircase_pull2(litw, nxt, dq, roll)

        # one funnel shift places the word's whole (contiguous) literal
        # window; soff < 0 when incoming-covered slots precede it (their
        # junk bytes are overwritten by the sym fill below)
        soff = pad4 - pcin
        s1 = jnp.maximum(soff, 0) << 3
        s2 = jnp.clip((4 - soff) << 3, 0, 31)
        right = (jax.lax.shift_right_logical(wA, s1)
                 | jnp.where(soff > 0, wB << s2, 0))
        left = wA << (jnp.maximum(-soff, 0) << 3)
        lit_word = jnp.where(soff >= 0, right, left)

        # nibble masks -> per-byte masks (no carries: bits are isolated),
        # then one select-free assembly of the output word.  Shift/add
        # forms only: 32-bit vector multiplies are multi-op on the VPU
        def expand(m):
            sp = ((m & 1) | ((m & 2) << 7) | ((m & 4) << 14)
                  | ((m & 8) << 21))
            return (sp << 8) - sp                    # x 0xFF

        def repl4(x):                                # x * 0x01010101
            x2 = x | (x << 8)
            return x2 | (x2 << 16)

        sIn = repl4((WC - 1) & 0xFF)
        sNew = repl4(((WC + Ti) - 1) & 0xFF)
        out = ((sIn & expand(mask_in)) | (sNew & expand(mask_new))
               | (lit_word & ~expand(cov4)))
    else:                              # profiling stage 2: no literal move
        out = cov4 | (d4 << 8)

    # ---- per-block epilogue: fast paths + tail masks ----
    for g in range(G):
        b = cell * G + g
        meta = meta_ref[b]
        blen = meta & 0xFFFFF
        all_lit = (meta >> 20) & 1
        all_run = (meta >> 21) & 1
        sym0 = (meta >> 22) & 0xFF

        @pl.when(all_lit == 1)
        def _(g=g):
            # mask-free copy: the gate requires n_lits == blen and the
            # padded literal plane is zero beyond n_lits, so the copied
            # tail already matches the masked-decode contract
            out_ref[g] = litw_ref[g]

        @pl.when(all_run == 1)
        def _(g=g, sym0=sym0):
            out_ref[g] = (jnp.minimum(flatw, 0)
                          + sym0 * jnp.int32(0x01010101))

        @pl.when(all_lit + all_run == 0)
        def _(g=g, blen=blen):
            o = out[g, :R4]

            @pl.when(blen >= B)
            def _():
                out_ref[g] = o

            @pl.when(blen < B)
            def _():
                nf = jnp.clip(blen - 4 * flatw, 0, 4)
                pm = (1 << (jnp.minimum(nf, 3) * 8)) - 1
                out_ref[g] = jnp.where(nf >= 4, o, o & pm)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret",
                                             "stage", "out_words"))
def _decode_jit(sym, count, lit_len, lits, n_cmds, n_lits, block_len, *,
                block_size: int, interpret: bool, stage: int,
                out_words: bool) -> jnp.ndarray:
    nb, C = count.shape
    B = block_size
    R4 = B // 512
    R4p = max(-(-R4 // 8) * 8, WQ)
    assert _UNROLL % _QUAD == 0, (_UNROLL, _QUAD)

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
    # a column of 128 slots inside its stripe; dense stripes get multiple
    # columns, and the budget ns*Q + ceil(E/128) always suffices (each
    # stripe's allocation is padded to a _QUAD multiple so paint quads are
    # stripe-pure; see _QUAD)
    ns = -(-B // STRIPE_BYTES)
    NC = ns * _QUAD + -(-E // ROW)
    NC = -(-NC // _UNROLL) * _UNROLL   # kernel paints _UNROLL-column groups
    live = (pos < B) & (val != 0)
    s_i = jnp.where(live, pos >> STRIPE_BYTES.bit_length() - 1,
                    ns).astype(jnp.int32)                    # stripe of pos
    sb = jnp.arange(ns, dtype=jnp.int32)
    # lane-minor one-hot reduce ([nb, ns, E] with E on the lane axis)
    cnt = jnp.sum((s_i[:, None, :] == sb[None, :, None]).astype(jnp.int32),
                  axis=2)                                    # [nb, ns]
    lo = jnp.cumsum(cnt, axis=1) - cnt
    need = -(-cnt // ROW)                                    # cols/stripe
    ncols = -(-need // _QUAD) * _QUAD                        # quad-padded
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
    # per-column stripe metadata via ns static selects (take_along_axis
    # gathers lower to per-element loops on TPU; ns <= 8)
    lo_c = jnp.zeros_like(s_of_c)
    st_c = jnp.zeros_like(s_of_c)
    cnt_c = jnp.zeros_like(s_of_c)
    for s in range(ns):
        hit = s_of_c == s
        lo_c = jnp.where(hit, lo[:, s:s + 1], lo_c)
        st_c = jnp.where(hit, colstart[:, s:s + 1], st_c)
        cnt_c = jnp.where(hit, cnt[:, s:s + 1], cnt_c)
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
    # stripe start word-row, 8-aligned: stripe starts are multiples of WQ
    # and the padded-plane clip bound R4p-WQ is a multiple of 8, so the
    # window always covers the last rows (ADVICE r4), packed with the
    # column's live-slot count
    r0 = jnp.clip(jnp.where(in_use, s_of_c * WQ, 0), 0, max(R4p - WQ, 0))
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
    # per-block used-column count bounds the kernel's paint trip count;
    # fast-path blocks paint nothing at all
    ucols = jnp.where((all_lit | all_run) > 0, 0,
                      used[:, 0]).astype(jnp.int32)

    # group blocks per grid cell: batches the route pull and amortizes the
    # latency-bound small-plane scans across G blocks
    G = _GROUP if nb >= _GROUP else 1
    nbp = -(-nb // G) * G
    if nbp != nb:
        padb = nbp - nb
        # pad blocks decode as all-literal zero-length: one cheap copy
        meta = jnp.concatenate([meta, jnp.full(padb, 1 << 20, jnp.int32)])
        ucols = jnp.concatenate([ucols, jnp.zeros(padb, jnp.int32)])
        code = jnp.pad(code, ((0, padb), (0, 0)))
        ev_src = jnp.pad(ev_src, ((0, padb), (0, 0)),
                         constant_values=_PAD_WORD)
        d_pull = jnp.pad(d_pull, ((0, padb), (0, 0)))
        litw = jnp.pad(litw, ((0, padb), (0, 0), (0, 0)))

    kernel = functools.partial(_decode_body, NC=NC, R4=R4, R4p=R4p, G=G,
                               interpret=interpret, stage=stage)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nbp // G,),
        in_specs=[
            pl.BlockSpec((G, NC, ROW), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((G, NC, ROW), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((G, R4, ROW), lambda c, *_: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, R4, ROW), lambda c, *_: (c, 0, 0)),
        scratch_shapes=[pltpu.VMEM((G, R4p, ROW), jnp.bfloat16)] * 4
        + [pltpu.VMEM((G, NC // _QUAD, _QUAD * ROW), jnp.int32)],
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
    )(code, meta, ucols, ev_src.reshape(nbp, NC, ROW),
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
    Callers must guarantee every emitted run spans >= MIN_RUN bytes (the
    boundary-descriptor contract; see fits_kernel).
    ``stage`` is a profiling knob (0 = prep/IO, 1 = +route+paint,
    2 = +carries+coverage, 3 = full decode)."""
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

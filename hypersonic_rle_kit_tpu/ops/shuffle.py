"""Scan/roll vector primitives: gather/scatter-free data movement on the VPU.

TPUs have no fast arbitrary gather or scatter, and staged shift networks on a
one-value-per-lane machine collide for general monotone routes.  What *is*
exactly realizable with uniform rolls + selects are **associative scans**
(prefix sums, forward-fills), and those turn out to be all the device codec
paths need: run expansion becomes a prefix sum over open/close markers
(painted by small one-hot matmuls on the MXU), and literal placement becomes
a forward-filled stream offset plus an intra-row window shuffle.

This replaces the serial half of the reference's decode hot loop
(rle8_extreme_cpu.h:1825-1913 walks commands, alternating MEMCPY/MEMSET):
the serial output-cursor bookkeeping becomes scans, the memcpy/memset become
full-width vector selects.

All functions treat the trailing two axes as a (rows, 128) tile in row-major
("flat") order and broadcast over leading batch axes; they are pure jnp, so
they run identically under XLA on CPU/TPU and inside Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128


def _jroll(x, s, axis):
    return jnp.roll(x, s, axis)


def flat_roll(x: jnp.ndarray, s: int, roll=_jroll) -> jnp.ndarray:
    """Roll a [..., R, 128] tile by ``s`` positions forward in row-major
    order (``y[flat p] = x[flat p - s]``, wrapping at the tile boundary).
    ``s`` is a static Python int.  ``roll`` selects the rotate primitive:
    the default ``jnp.roll`` under XLA, ``pltpu.roll`` inside kernels."""
    R = x.shape[-2]
    s %= R * LANES
    m, q = s % LANES, s // LANES
    c = roll(x, m, x.ndim - 1) if m else x
    a = roll(c, q, x.ndim - 2) if q else c
    if m == 0:
        return a
    b = roll(c, q + 1, x.ndim - 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane >= m, a, b)


def inclusive_cumsum_tile(x: jnp.ndarray, roll=_jroll) -> jnp.ndarray:
    """Inclusive prefix sum over the flattened trailing (rows, 128) tile:
    within-row log-shift scan, then a cross-row carry scan — uniform shifts
    only, no gathers."""
    s = x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for b in range(7):                      # inclusive scan within each row
        sh = roll(s, 1 << b, x.ndim - 1)
        s = s + jnp.where(lane >= (1 << b), sh, 0)
    R = x.shape[-2]
    if R == 1:
        return s
    row_tot = s[..., -1:]                   # [..., R, 1]
    acc = row_tot
    row = jax.lax.broadcasted_iota(jnp.int32, acc.shape, acc.ndim - 2)
    for b in range(max(1, (R - 1).bit_length())):
        sh = roll(acc, 1 << b, x.ndim - 2)
        acc = acc + jnp.where(row >= (1 << b), sh, 0)
    return s + (acc - row_tot)              # add carry from earlier rows


def exclusive_cumsum_tile(x: jnp.ndarray, roll=_jroll) -> jnp.ndarray:
    """Exclusive prefix sum over the flattened trailing (rows, 128) tile."""
    return inclusive_cumsum_tile(x, roll) - x


def staircase_pull(x: jnp.ndarray, d: jnp.ndarray, roll=_jroll) -> jnp.ndarray:
    """Monotone gather ``y[p] = x[p - d[p]]`` over the flattened trailing
    (rows, 128) tile, valid when the source map ``src(p) = p - d[p]`` is a
    **staircase**: ``src(0) >= 0`` and ``src(p+1) - src(p) ∈ {0, 1}``.

    Processes displacement bits high-to-low with one uniform roll + select
    per bit.  General monotone maps collide under this scheme, but staircase
    maps (exhaustively verified to n=12, randomized to n=1024) route
    conflict-free — and a staircase is exactly what literal expansion needs:
    the source literal index advances by at most one per output byte.
    This is the TPU replacement for the decoder's literal MEMCPY walk
    (rleX_extreme_common.h:116-142).
    """
    R = x.shape[-2]
    nbits = (R * LANES - 1).bit_length()
    # walk displacement bits MSB-first with the tested bit held at the
    # sign position: one compare + one shift per level instead of
    # shift/and/compare (~15% of the whole decode kernel's VPU time)
    ds = d << (32 - nbits)
    for b in reversed(range(nbits)):
        shifted = flat_roll(x, 1 << b, roll)
        x = jnp.where(ds < 0, shifted, x)
        ds = ds << 1
    return x


def inclusive_cummax_tile(x: jnp.ndarray, roll=_jroll) -> jnp.ndarray:
    """Inclusive prefix max over the flattened trailing (rows, 128) tile
    (same shift network as :func:`inclusive_cumsum_tile`)."""
    s = x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    low = jnp.iinfo(x.dtype).min
    for b in range(7):
        sh = roll(s, 1 << b, x.ndim - 1)
        s = jnp.maximum(s, jnp.where(lane >= (1 << b), sh, low))
    R = x.shape[-2]
    if R == 1:
        return s
    row_tot = s[..., -1:]
    acc = row_tot                       # inclusive max-scan of row maxima
    row = jax.lax.broadcasted_iota(jnp.int32, row_tot.shape, row_tot.ndim - 2)
    for b in range(max(1, (R - 1).bit_length())):
        sh = roll(acc, 1 << b, x.ndim - 2)
        acc = jnp.maximum(acc, jnp.where(row >= (1 << b), sh, low))
    excl = jnp.where(row >= 1, roll(acc, 1, x.ndim - 2), low)
    return jnp.maximum(s, excl)


def suffix_min_tile(x: jnp.ndarray, roll=_jroll) -> jnp.ndarray:
    """Inclusive suffix min over the flattened trailing (rows, 128) tile:
    ``y[p] = min(x[p:])``.  Backward doubling with uniform rolls only."""
    R = x.shape[-2]
    n = R * LANES
    big = jnp.iinfo(x.dtype).max
    pos = (jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1))
    s = x
    b = 0
    while (1 << b) < n:
        sh = jnp.where(pos < n - (1 << b), flat_roll(s, -(1 << b), roll), big)
        s = jnp.minimum(s, sh)
        b += 1
    return s


def flat_compact(cols, keep: jnp.ndarray, roll=_jroll, d=None):
    """Order-preserving left-compaction over the flattened trailing
    (rows, 128) tile: elements of each column in ``cols`` where ``keep`` is
    True end up packed at the start (flat order), followed by junk.

    Every kept element moves left by ``delta = #dropped before it``; the
    move is routed one displacement bit at a time (LSB first) with uniform
    rolls + selects.  Monotone non-crossing of kept elements guarantees no
    kept element is ever overwritten (exhaustively verified to n=12,
    randomized to n=4000).  This is the TPU dual of the encoder's serial
    command/literal emission cursor (rle8_extreme_cpu.h:768-931).

    Returns ``(compacted_cols, None)`` — callers derive validity from the
    kept-count (``flat_pos < keep.sum()``); no live mask is materialized.

    Live-free routing (round 5): dropped elements and stale source copies
    carry ``d = 0``, so they are never taken as movers — the per-level
    ``live``-plane roll of the r4 router (1 extra flat_roll + 3 elementwise
    per level, ~25% of the whole compaction) is gone.  Kept elements route
    exactly as before: ``d`` rides along unchanged and bit ``b`` of it is
    consumed only at level ``b``; a source slot whose element just left has
    its own bit set and is zeroed (frozen junk), so duplicates never
    propagate.

    ``d`` may carry a precomputed dropped-before-count plane (callers
    often already hold it — e.g. the encode kernel's coverage prefix is
    exactly the literal displacement), skipping the internal cumsum.
    """
    R = keep.shape[-2]
    n = R * LANES
    pos = (jax.lax.broadcasted_iota(jnp.int32, keep.shape, keep.ndim - 2)
           * LANES
           + jax.lax.broadcasted_iota(jnp.int32, keep.shape, keep.ndim - 1))
    if d is None:
        d = exclusive_cumsum_tile((~keep).astype(jnp.int32), roll)
    d = jnp.where(keep, d, 0)           # dropped elements never move
    cols = list(cols)
    for b in range(max(1, (n - 1).bit_length())):
        s = 1 << b
        in_range = pos < n - s
        sd = flat_roll(d, -s, roll)
        take = in_range & ((sd >> b) & 1 == 1)
        own = (d >> b) & 1 == 1
        d = jnp.where(take, sd, jnp.where(own, 0, d))
        cols = [jnp.where(take, flat_roll(c, -s, roll), c) for c in cols]
    return cols, None


def row_compact(cols, keep: jnp.ndarray, roll=_jroll, want_d: bool = False):
    """Order-preserving left-compaction *within each 128-lane row* of a
    [R, 128] tile: the flat_compact LSB router restricted to lane rolls
    (7 levels of whole-plane ops, no cross-row movement).  Returns
    ``(compacted_cols, cnt)`` where ``cnt[r, 0]`` counts kept elements of
    row r (packed into its first ``cnt`` lanes).

    With ``want_d`` the routed displacement plane is returned as a third
    value: slot ``(r, j)`` holding a kept element rode in with its
    within-row displacement, so its *source lane* is ``j + d[r, j]`` —
    callers can recover original positions without routing a position
    column through the network (one fewer lane roll per level)."""
    ax = keep.ndim - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, keep.shape, ax)
    cnt = jnp.sum(keep.astype(jnp.int32), axis=-1, keepdims=True)
    nk = (~keep).astype(jnp.int32)
    s = nk
    for b in range(7):                   # within-row inclusive scan
        s = s + jnp.where(lane >= (1 << b), roll(s, 1 << b, ax), 0)
    d = s - nk                           # dropped-before within the row
    d = jnp.where(keep, d, 0)            # live-free router: see flat_compact
    cols = list(cols)
    for b in range(7):
        sh = 1 << b
        back = (LANES - sh) % LANES      # lane roll by -sh (rolls >= 0)
        in_range = lane < LANES - sh
        sd = roll(d, back, ax)
        take = in_range & ((sd >> b) & 1 == 1)
        own = (d >> b) & 1 == 1
        d = jnp.where(take, sd, jnp.where(own, 0, d))
        cols = [jnp.where(take, roll(c, back, ax), c) for c in cols]
    if want_d:
        return cols, cnt, d
    return cols, cnt


def pack_rows4(c: jnp.ndarray, roll=_jroll) -> jnp.ndarray:
    """[..., R, 128] -> [..., R//4, 128]: lane group g of packed row r2
    holds lanes 0..31 of source row 4*r2+g (valid when each source row's
    payload fits its first 32 lanes -- commands per 128-byte row are
    bounded by 128/min_count <= 32 for min_count >= 4)."""
    R = c.shape[-2]
    lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, c.ndim - 1)
    z1 = roll(c, R - 1, c.ndim - 2)          # row r+1 (rolls must be >= 0)
    z2 = roll(c, R - 2, c.ndim - 2)
    z3 = roll(c, R - 3, c.ndim - 2)
    y = jnp.where(lane < 32, c,
                  jnp.where(lane < 64, roll(z1, 32, c.ndim - 1),
                            jnp.where(lane < 96, roll(z2, 64, c.ndim - 1),
                                      roll(z3, 96, c.ndim - 1))))
    return y.reshape(*c.shape[:-2], R // 4, 4, LANES)[..., 0, :]


def forward_fill_tile(x: jnp.ndarray, valid: jnp.ndarray, roll=_jroll):
    """Forward-fill over the flattened trailing (rows, 128) tile: every flat
    position takes the value of the nearest valid position at or before it
    (an inclusive scan of the associative "keep-rightmost-valid" combiner).
    Positions before the first valid one keep their input value.

    Returns ``(filled, filled_valid)``.
    """
    R = x.shape[-2]
    n = R * LANES
    pos = (jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1))
    v = valid.astype(jnp.int32)         # masks roll as i32 (Mosaic has no
    b = 0                               # sub-32-bit rotate)
    while (1 << b) < n:
        s = 1 << b
        cx = flat_roll(x, s, roll)
        cv = (flat_roll(v, s, roll) == 1) & (pos >= s)  # no wrap at start
        take = (v == 0) & cv
        x = jnp.where(take, cx, x)
        v = jnp.maximum(v, cv.astype(jnp.int32))
        b += 1
    return x, v == 1

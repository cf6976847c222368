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


def flat_roll(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Roll a [..., R, 128] tile by ``s`` positions forward in row-major
    order (``y[flat p] = x[flat p - s]``, wrapping at the tile boundary).
    ``s`` is a static Python int."""
    R = x.shape[-2]
    s %= R * LANES
    m, q = s % LANES, s // LANES
    c = jnp.roll(x, m, axis=-1) if m else x
    a = jnp.roll(c, q, axis=-2) if q else c
    if m == 0:
        return a
    b = jnp.roll(c, q + 1, axis=-2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane >= m, a, b)


def inclusive_cumsum_tile(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum over the flattened trailing (rows, 128) tile:
    within-row log-shift scan, then a cross-row carry scan — uniform shifts
    only, no gathers."""
    s = x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for b in range(7):                      # inclusive scan within each row
        sh = jnp.roll(s, 1 << b, axis=-1)
        s = s + jnp.where(lane >= (1 << b), sh, 0)
    R = x.shape[-2]
    if R == 1:
        return s
    row_tot = s[..., -1:]                   # [..., R, 1]
    acc = row_tot
    row = jax.lax.broadcasted_iota(jnp.int32, acc.shape, acc.ndim - 2)
    for b in range(max(1, (R - 1).bit_length())):
        sh = jnp.roll(acc, 1 << b, axis=-2)
        acc = acc + jnp.where(row >= (1 << b), sh, 0)
    return s + (acc - row_tot)              # add carry from earlier rows


def exclusive_cumsum_tile(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum over the flattened trailing (rows, 128) tile."""
    return inclusive_cumsum_tile(x) - x


def forward_fill_tile(x: jnp.ndarray, valid: jnp.ndarray):
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
    b = 0
    while (1 << b) < n:
        s = 1 << b
        cx = flat_roll(x, s)
        cv = flat_roll(valid, s) & (pos >= s)   # don't wrap across the start
        take = ~valid & cv
        x = jnp.where(take, cx, x)
        valid = valid | cv
        b += 1
    return x, valid

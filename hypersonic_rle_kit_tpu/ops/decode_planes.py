"""Decode kernel v2: strided delta-paint run expansion.

The retired v1 kernel evaluated every command window against every lane
(a W-deep compare loop) and gathered literals with a one-hot MXU
contraction — ~500 vector ops per output byte.  v2 replaces both with a
formulation whose device cost is ~25 int32 ops/byte and whose host prep cost
is O(compressed size), not O(raw size):

- **delta plane** (int16, one per output byte position): at each run's first
  byte the encoder-side prep adds ``256 + symbol``; at the first byte past
  the run it adds ``-(256 + symbol)``.  Runs are split at 128-byte row
  boundaries (re-opened at the next row start), so a per-row prefix sum
  reconstructs, at every covered lane, exactly ``256 + symbol`` (and 0 at
  literal lanes): runs are disjoint, so every prefix/window sum stays in
  [-511, 511] and int16 never overflows.  This is the scan-friendly dual of
  the reference's sequential memset loop (rle8_extreme_cpu.h:1825-1913): the
  serial "current output position" bookkeeping becomes an associative sum.
- **literal plane** (uint8): literal bytes stored at their final decoded
  positions (zero under runs).  Prep writes exactly n_lits bytes — there is
  no gather left on the device, where gathers cost ~11 ns/element.
- **kernel**: a log-step strided prefix sum along the 128-lane axis
  (`pltpu.roll` + masked add, 7 steps), then
  ``out = sum >= 256 ? (sum & 0xFF) : lit``.  The stride equals the symbol
  width in bytes, which makes the same kernel decode the 16/24/32/48/64/128
  bit families: a run of a w-byte pattern is w interleaved constant
  byte-classes, and a stride-w scan keeps the classes independent
  (the TPU analog of the reference's staggered broadcast registers,
  rleX_Xsl_short.h:2401-2418).

HBM traffic is 2 (delta) + 1 (literals) + 1 (out) bytes per output byte, so
the kernel's roofline on one v5e chip (819 GB/s) is ~200 GB/s of decoded
output -- ~8x the reference CPU's headline decode rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 128
_OPEN = 256


# ---------------------------------------------------------------------------
# host prep (numpy golden; utils/native.py has the C++ fast path)
# ---------------------------------------------------------------------------

def planes_from_planar_np(sym, count, lit_len, lits, n_cmds, width: int = 1):
    """Planar block columns -> (delta int16 [nb, B], lit uint8 [nb, B]).

    ``sym`` is [nb, cap] (width 1) or [nb, cap, width] pattern bytes;
    ``count`` is in bytes.  Golden model for the native prep.
    """
    nb, cap = count.shape
    B = lits.shape[1]
    delta = np.zeros((nb, B), np.int16)
    lit_plane = np.zeros((nb, B), np.uint8)
    pat_of = (lambda b, c: sym[b, c:c + 1]) if sym.ndim == 2 else \
        (lambda b, c: sym[b, c])
    for b in range(nb):
        pos = 0
        lp = 0
        for c in range(int(n_cmds[b])):
            ll = int(lit_len[b, c])
            lit_plane[b, pos:pos + ll] = lits[b, lp:lp + ll]
            lp += ll
            pos += ll
            ct = int(count[b, c])
            if ct == 0:
                continue
            pat = pat_of(b, c)
            a, e = pos, pos + ct
            s = a
            while s < e:
                row_end = (s // ROW + 1) * ROW
                se = min(e, row_end)
                for k in range(width):
                    p0 = s + ((k - (s - a)) % width)
                    if p0 >= se:
                        continue
                    v = int(pat[k])
                    delta[b, p0] += _OPEN + v
                    pe = p0 + ((se - 1 - p0) // width) * width + width
                    if pe < row_end:
                        delta[b, pe] -= _OPEN + v
                s = se
            pos = e
    return delta, lit_plane


def decode_planes_host(delta: np.ndarray, lit: np.ndarray,
                       width: int = 1) -> np.ndarray:
    """Numpy model of the kernel (per-row per-class cumsum + select)."""
    nb, B = delta.shape
    d = delta.reshape(-1, ROW).astype(np.int64)
    c = np.empty_like(d)
    for k in range(width):
        c[:, k::width] = np.cumsum(d[:, k::width], axis=1)
    out = np.where(c >= _OPEN, c & 0xFF, lit.reshape(-1, ROW))
    return out.reshape(nb, B).astype(np.uint8)


# ---------------------------------------------------------------------------
# v3: fused single-plane decode
#
# Exact mod-256 cancellation lets the literal plane fold into the delta
# plane, halving HBM traffic (1 read + 1 write per output byte) and deleting
# the coverage select: every output byte is the strided mod-256 prefix sum of
# one uint8 plane.  Prep emits, per run (split at rows / byte classes),
# ``+sym`` at the open and ``-sym`` at the close, and per literal byte
# ``+lit`` at its position and ``-lit`` at the next same-class position —
# each prefix therefore telescopes to exactly the output byte.  Prep write
# count stays O(compressed): two per literal byte, two per run-row-class.
# ---------------------------------------------------------------------------

def fused_delta_from_planar_np(sym, count, lit_len, lits, n_cmds,
                               width: int = 1):
    """Planar block columns -> fused delta plane (uint8 [nb, B])."""
    nb, cap = count.shape
    B = lits.shape[1]
    delta = np.zeros((nb, B), np.uint8)
    pat_of = (lambda b, c: sym[b, c:c + 1]) if sym.ndim == 2 else \
        (lambda b, c: sym[b, c])
    for b in range(nb):
        pos = 0
        lp = 0
        for c in range(int(n_cmds[b])):
            for _ in range(int(lit_len[b, c])):
                v = int(lits[b, lp])
                delta[b, pos] = (int(delta[b, pos]) + v) & 0xFF
                nxt = pos + width
                if nxt // ROW == pos // ROW and nxt < B:
                    delta[b, nxt] = (int(delta[b, nxt]) - v) & 0xFF
                lp += 1
                pos += 1
            ct = int(count[b, c])
            if ct == 0:
                continue
            pat = pat_of(b, c)
            a, e = pos, pos + ct
            s = a
            while s < e:
                row_end = (s // ROW + 1) * ROW
                se = min(e, row_end)
                for k in range(width):
                    p0 = s + ((k - (s - a)) % width)
                    if p0 >= se:
                        continue
                    v = int(pat[k])
                    delta[b, p0] = (int(delta[b, p0]) + v) & 0xFF
                    pe = p0 + ((se - 1 - p0) // width) * width + width
                    if pe < row_end:
                        delta[b, pe] = (int(delta[b, pe]) - v) & 0xFF
                s = se
            pos = e
    return delta


def decode_fused_host(delta: np.ndarray, width: int = 1) -> np.ndarray:
    """Numpy model of the fused kernel (strided mod-256 row cumsum)."""
    nb, B = delta.shape
    d = delta.reshape(-1, ROW).astype(np.int64)
    c = np.empty_like(d)
    for k in range(width):
        c[:, k::width] = np.cumsum(d[:, k::width], axis=1)
    return (c & 0xFF).astype(np.uint8).reshape(nb, B)


def _fused_kernel(delta_ref, tri_ref, out_ref):
    # The strided row prefix sum is one MXU contraction with the constant
    # "strided lower-triangular" matrix: cum[r, j] = sum_p d[r, p] * T[p, j],
    # T[p, j] = (p <= j and (j - p) % width == 0).  u8 deltas are exact in
    # bf16 (integers to 256) and row sums stay < 2^24, so f32 accumulation is
    # exact; the VPU only converts in and out.
    d = delta_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    cum = jax.lax.dot_general(d, tri_ref[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[...] = (cum.astype(jnp.int32) & 0xFF).astype(jnp.uint8)


def _fused_kernel_int8(delta_ref, tri_ref, out_ref, *, width: int):
    # int8 MXU variant: u8 deltas don't fit int8, but ``d - 128`` does
    # (``u8 ^ 0x80`` reinterpreted signed).  The missing ``+128`` per summed
    # term folds into a per-column constant: column j of the strided
    # triangular matrix has exactly ``j // width + 1`` ones, so
    # ``true_cum[j] = s8_cum[j] + 128 * (j // width + 1)`` — exact in int32.
    # Halves MXU cycles vs bf16 and skips the f32 round trip on the VPU.
    d = (delta_ref[...] ^ 0x80).astype(jnp.int8)
    cum = jax.lax.dot_general(d, tri_ref[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, cum.shape, 1)
    bias = 128 * (j // width + 1)
    out_ref[...] = ((cum + bias) & 0xFF).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _tri(width: int) -> np.ndarray:
    p = np.arange(ROW)[:, None]
    j = np.arange(ROW)[None, :]
    return ((p <= j) & ((j - p) % width == 0)).astype(np.float32)


@functools.partial(jax.jit,
                   static_argnames=("width", "tile_rows", "interpret", "impl"))
def decode_fused_device(delta: jnp.ndarray, *, width: int = 1,
                        tile_rows: int = 2048,
                        interpret: bool = False,
                        impl: str = "bf16") -> jnp.ndarray:
    """Decode a fused delta plane [nb, B] -> bytes [nb, B] (B % 128 == 0).

    ``impl``: 'bf16' (bf16 MXU + f32 accumulate) or 'int8' (int8 MXU +
    int32 accumulate with a folded +128 column bias) — both exact.
    """
    nb, B = delta.shape
    assert B % ROW == 0, B
    T = nb * (B // ROW)
    d = delta.reshape(T, ROW)
    TR = min(tile_rows, T)
    pad = (-T) % TR
    if pad:
        d = jnp.pad(d, ((0, pad), (0, 0)))
    if impl == "int8":
        kernel = functools.partial(_fused_kernel_int8, width=width)
        tri = jnp.asarray(_tri(width), jnp.int8)
    elif impl == "bf16":
        kernel = _fused_kernel
        tri = jnp.asarray(_tri(width), jnp.bfloat16)
    else:
        raise ValueError(f"impl must be 'bf16' or 'int8', got {impl!r}")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((T + pad), ROW), jnp.uint8),
        grid=((T + pad) // TR,),
        in_specs=[
            pl.BlockSpec((TR, ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW, ROW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, ROW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d, tri)
    return out[:T].reshape(nb, B)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _decode_kernel(delta_ref, lit_ref, out_ref, *, width: int):
    # int16 in HBM/VMEM (half the traffic); int32 in registers — Mosaic has
    # no 16-bit lane rotate.
    d = delta_ref[...].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    s = width
    while s < ROW:
        d = d + jnp.where(lane >= s, pltpu.roll(d, s, axis=1), 0)
        s *= 2
    sym = (d & 0xFF).astype(jnp.uint8)
    out_ref[...] = jnp.where(d >= _OPEN, sym, lit_ref[...])


@functools.partial(jax.jit,
                   static_argnames=("width", "tile_rows", "interpret"))
def decode_planes_device(delta: jnp.ndarray, lit: jnp.ndarray, *,
                         width: int = 1, tile_rows: int = 512,
                         interpret: bool = False) -> jnp.ndarray:
    """Decode delta/lit planes [nb, B] -> bytes [nb, B] (B % 128 == 0)."""
    nb, B = delta.shape
    assert B % ROW == 0, B
    T = nb * (B // ROW)
    d = delta.reshape(T, ROW)
    l = lit.reshape(T, ROW)
    TR = min(tile_rows, T)
    pad = (-T) % TR
    if pad:
        d = jnp.pad(d, ((0, pad), (0, 0)))
        l = jnp.pad(l, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_decode_kernel, width=width),
        out_shape=jax.ShapeDtypeStruct(((T + pad), ROW), jnp.uint8),
        grid=((T + pad) // TR,),
        in_specs=[
            pl.BlockSpec((TR, ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, ROW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, ROW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d, l)
    return out[:T].reshape(nb, B)

"""End-to-end device decode: compressed-size planar columns -> bytes, fully
on the accelerator.

Round 1's flagship kernel (ops/decode_planes.py) consumes a *dense* delta
plane — one input byte per output byte, built by an O(uncompressed) host
pass — so the compression ratio bought zero HBM bandwidth and the host prep
bounded the pipeline.  This module moves the entire expansion on-device with
inputs that stay O(compressed):

    per block: sym[C] u8, count[C] i32, lit_len[C] i32, lits[<=B] u8

The reference decoder's serial command walk (rle8_extreme_cpu.h:1825-1913:
read varint -> MEMCPY literals -> MEMSET run, with one output cursor) is
re-derived as four data-parallel stages over 1 KiB tiles (TR=8 rows x 128
lanes), the same work shape as its OpenCL work-groups (rle8_ocl_kernel.h):

1. **Command geometry** (O(C) vector math): prefix sums over the command
   columns give each run's absolute [start, end) output span.
2. **Run painting**: each tile sums, over a bounded per-tile command window
   (<= S/min_count + 2 entries, a bound the block format guarantees),
   one-hot contributions ``+(256+sym)`` at run opens and ``-(256+sym)`` at
   run closes; a per-tile carry accounts for runs spanning the whole tile.
   An inclusive prefix sum then reconstructs ``256+sym`` at every
   run-covered byte — the scan-friendly dual of MEMSET.
3. **Literal placement**: covered/literal masks fall out of the scan;
   within a tile the source literal index is a *staircase* (advances by at
   most 1 per byte), so a single ``staircase_pull`` (ops/shuffle.py) spreads
   the tile's literal window to its decoded positions — the dual of MEMCPY.
4. **Select + mask** produces the output bytes.

No per-byte gathers or scatters anywhere: the only gathers are O(C) command
windows and one contiguous S-byte literal window per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import shuffle

ROW = 128
TR = 8                      # rows per tile
S = TR * ROW                # tile size in bytes
_OPEN = 256


def _window_capacity(min_count: int) -> int:
    """Max commands whose span can start (or end) inside one S-byte tile:
    consecutive run starts are >= min_count bytes apart, +2 slack (boundary
    run + tail), rounded up to a lane multiple."""
    ek = S // max(min_count, 1) + 2
    return (ek + ROW - 1) // ROW * ROW


def _windows(pos, val, e0, ek, C):
    """Gather per-tile command windows: entries [e0[t], e0[t]+ek) of the
    position-sorted (pos, val) streams.  [nb, T] e0 -> [nb, T, ek]."""
    idx = jnp.clip(e0[..., None] + jnp.arange(ek, dtype=jnp.int32), 0, C - 1)
    take = lambda a: jnp.take_along_axis(a[:, None, :], idx, axis=-1)
    return take(pos), take(val)


@functools.partial(jax.jit, static_argnames=("block_size", "min_count"))
def decode_planar_device(sym: jnp.ndarray, count: jnp.ndarray,
                         lit_len: jnp.ndarray, lits: jnp.ndarray,
                         n_cmds: jnp.ndarray, block_len: jnp.ndarray, *,
                         block_size: int, min_count: int = 6) -> jnp.ndarray:
    """Decode planar blocks wholly on-device.

    sym/count/lit_len: [nb, C]; lits: [nb, BL] (BL >= max literals);
    n_cmds/block_len: [nb].  Returns [nb, block_size] uint8 (zero past
    block_len).  block_size must be a multiple of S (1024).
    """
    nb, C = count.shape
    B = block_size
    assert B % S == 0, B
    T = B // S
    ek = _window_capacity(min_count)
    SENT = jnp.int32(B + S)                 # sorted-past-everything sentinel

    c_idx = jnp.arange(C, dtype=jnp.int32)[None, :]
    real = c_idx < n_cmds[:, None]
    lit_len = jnp.where(real, lit_len, 0)
    count = jnp.where(real, count, 0)
    span = lit_len + count
    out_start = jnp.cumsum(span, axis=-1) - span
    run_start = out_start + lit_len
    run_end = run_start + count
    is_run = real & (count > 0)

    vali = (_OPEN + sym.astype(jnp.int32))
    open_pos = jnp.where(is_run, run_start, SENT)
    open_val = jnp.where(is_run, vali, 0)
    # a close on a tile boundary is dropped: the run simply is not carried
    # into the next tile, so there is nothing to subtract there
    close_keep = is_run & (run_end % S != 0)
    close_pos = jnp.where(close_keep, run_end, SENT)
    close_val = jnp.where(close_keep, -vali, 0)

    # per-tile window starts + whole-tile run carries (compare-sums over the
    # command axis; O(T*C) bool work, ~8 ops per output byte)
    bnd = (jnp.arange(T, dtype=jnp.int32) * S)[None, :, None]   # [1, T, 1]
    e0_open = jnp.sum((open_pos[:, None, :] < bnd) & is_run[:, None, :],
                      axis=-1, dtype=jnp.int32)
    e0_close = jnp.sum((run_end[:, None, :] <= bnd) & is_run[:, None, :],
                       axis=-1, dtype=jnp.int32)
    carry = jnp.sum(jnp.where(
        is_run[:, None, :] & (run_start[:, None, :] < bnd)
        & (run_end[:, None, :] > bnd), vali[:, None, :], 0),
        axis=-1, dtype=jnp.int32)                                # [nb, T]

    opw_pos, opw_val = _windows(open_pos, open_val, e0_open, ek, C)
    clw_pos, clw_val = _windows(close_pos, close_val, e0_close, ek, C)
    wpos = jnp.concatenate([opw_pos, clw_pos], axis=-1)          # [nb,T,2ek]
    wval = jnp.concatenate([opw_val, clw_val], axis=-1)

    # paint the delta tile: delta[s, l] = sum_e wval_e * (wpos_e == flat)
    tp = wpos - bnd                                              # tile-local
    flat = (jax.lax.broadcasted_iota(jnp.int32, (TR, ROW), 0) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (TR, ROW), 1))
    hits = (tp[:, :, None, None, :] == flat[None, None, :, :, None])
    delta = jnp.sum(jnp.where(hits, wval[:, :, None, None, :], 0),
                    axis=-1, dtype=jnp.int32)                    # [nb,T,TR,128]
    delta = delta.at[:, :, 0, 0].add(carry)

    cum = shuffle.inclusive_cumsum_tile(delta)
    cov = cum >= _OPEN
    sym_exp = (cum & 0xFF).astype(jnp.uint8)

    # literal placement: within a tile the source literal index is a
    # staircase of the literal rank; one window slice + one staircase pull
    p_global = bnd[..., None] + flat[None, None]        # [1, T, TR, ROW]
    in_len = p_global < block_len[:, None, None, None]
    is_lit = (~cov) & in_len
    lit_i32 = is_lit.astype(jnp.int32)
    rank_tile = (shuffle.inclusive_cumsum_tile(lit_i32) - lit_i32)
    tile_cnt = jnp.sum(lit_i32, axis=(-2, -1))                   # [nb, T]
    l0 = jnp.cumsum(tile_cnt, axis=-1) - tile_cnt                # [nb, T]

    BL = lits.shape[1]
    lits_pad = jnp.pad(lits, ((0, 0), (0, S)))
    widx = jnp.clip(l0[..., None] + jnp.arange(S, dtype=jnp.int32),
                    0, BL + S - 1)
    litwin = jnp.take_along_axis(lits_pad[:, None, :], widx, axis=-1)
    litwin = litwin.reshape(nb, T, TR, ROW)
    pos_in_tile = flat[None, None]
    lit_exp = shuffle.staircase_pull(litwin, pos_in_tile - rank_tile)

    out = jnp.where(cov, sym_exp, lit_exp)
    out = jnp.where(in_len, out, 0)
    return out.reshape(nb, B)


def decompress_container_device(buf: bytes, *, backend_check: bool = True):
    """HRT1 container -> decoded bytes via the on-device pipeline.  The host
    does only O(compressed) work: parse the table and unpack the bit-packed
    columns (parallel/container.py); expansion runs on the accelerator.

    Returns (bytes, info).
    """
    import numpy as np

    from ..parallel import container

    info, cols = container.deserialize_to_planar(bytes(buf))
    sym, count, lit_len, lits, n_cmds, n_lits, block_len = cols
    if info.uncompressed_size == 0:
        return b"", info
    y = np.asarray(decode_planar_device(
        jnp.asarray(sym), jnp.asarray(count), jnp.asarray(lit_len),
        jnp.asarray(lits), jnp.asarray(n_cmds), jnp.asarray(block_len),
        block_size=info.block_size, min_count=info.min_count))
    mask = np.arange(info.block_size)[None, :] < block_len[:, None]
    return y[mask].tobytes(), info

"""Device (XLA) encode/decode over planar blocks.

Pure-jnp formulations that XLA can tile onto the VPU; the Pallas kernels in
ops/decode_sup.py and ops/encode_sup.py specialize the hot paths.  Everything is
shape-static and vmapped over the block axis, so the same code runs under
`jit`, inside `shard_map` partitions, and on the CPU backend for tests.

Algorithmic mapping from the reference's scalar loops (SURVEY.md section 7):

- encode: neighbor-compare -> run boundaries -> distance-to-next-boundary via
  reversed cumulative minimum -> emission mask (cost model) -> prefix-sum
  compaction of commands and literals.  Replaces the cmpeq/movemask/ctz scan
  loop (rle8_extreme_cpu.h:768-931).
- decode: exclusive prefix sums of (lit_len + count) give each command's
  output start; a vectorized searchsorted assigns commands to output
  positions; a masked gather-or-broadcast materializes bytes.  Replaces the
  memcpy/memset command loop (rle8_extreme_cpu.h:1546-1634).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .planar import PlanarBlocks


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_block(x: jnp.ndarray, n: jnp.ndarray, capacity: int,
                  min_count: int, only_sym: jnp.ndarray) -> tuple:
    """Encode one block of ``B`` bytes (``n`` valid) into planar commands.
    ``only_sym`` < 0 emits every qualifying run; otherwise only runs of
    that byte (Single family, rle8_extreme_cpu.c:53-153)."""
    B = x.shape[0]
    pos = jnp.arange(B, dtype=jnp.int32)
    valid = pos < n

    # pad with an alternating out-of-alphabet pattern so no run crosses n
    xi = jnp.where(valid, x.astype(jnp.int32), 256 + (pos & 1))

    bnd = jnp.concatenate([jnp.ones(1, bool), xi[1:] != xi[:-1]])  # run starts
    # next boundary strictly after i (reverse cumulative minimum)
    bnd_idx = jnp.where(bnd, pos, B)
    nxt = jnp.concatenate([bnd_idx[1:], jnp.full(1, B, jnp.int32)])
    next_bnd = jax.lax.cummin(nxt[::-1])[::-1]
    run_len = jnp.where(bnd, jnp.minimum(next_bnd, n) - pos, 0)

    emit = bnd & valid & (run_len >= min_count) & \
        ((only_sym < 0) | (xi == only_sym))
    emit_cum = jnp.cumsum(emit.astype(jnp.int32))
    n_runs = emit_cum[-1]

    # command k -> its run-start position (B for padding slots)
    k = jnp.arange(capacity, dtype=jnp.int32)
    cmd_pos = jnp.searchsorted(emit_cum, k + 1, side="left").astype(jnp.int32)
    cmd_pos_c = jnp.minimum(cmd_pos, B - 1)
    real = k < n_runs

    sym = jnp.where(real, x[cmd_pos_c], 0).astype(jnp.uint8)
    count = jnp.where(real, run_len[cmd_pos_c], 0)
    start = jnp.where(real, cmd_pos, 0)
    end = start + count
    prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32), end[:-1]])
    lit_len = jnp.where(real, start - prev_end, 0)

    # tail command at index n_runs: trailing literals, count == 0
    last_end = jnp.where(n_runs > 0, end[jnp.maximum(n_runs - 1, 0)], 0)
    lit_len = lit_len.at[n_runs].set(n - last_end)
    n_cmds = n_runs + 1

    # literal compaction: bytes not covered by an emitted run
    cover_end = jax.lax.cummax(jnp.where(emit, pos + run_len, 0))
    lit_keep = valid & (pos >= cover_end)
    lit_cum = jnp.cumsum(lit_keep.astype(jnp.int32))
    n_lits = lit_cum[-1]
    p = jnp.arange(B, dtype=jnp.int32)
    lit_src = jnp.searchsorted(lit_cum, p + 1, side="left").astype(jnp.int32)
    lits = jnp.where(p < n_lits, x[jnp.minimum(lit_src, B - 1)], 0
                     ).astype(jnp.uint8)

    return sym, count, lit_len, lits, n_cmds, n_lits, n


@functools.partial(jax.jit, static_argnames=("capacity", "min_count"))
def encode_blocks(x: jnp.ndarray, block_len: jnp.ndarray, *, capacity: int,
                  min_count: int = 6,
                  only_sym: jnp.ndarray | None = None) -> PlanarBlocks:
    """Encode ``[nb, B]`` bytes into planar commands. ``block_len[nb]`` gives
    the valid byte count of each block (all but the last are usually B);
    ``only_sym[nb]`` (or None) restricts emission per block (Single)."""
    if only_sym is None:
        only_sym = jnp.full(x.shape[0], -1, jnp.int32)
    enc = jax.vmap(lambda xb, nb, os_: _encode_block(xb, nb, capacity,
                                                     min_count, os_))
    sym, count, lit_len, lits, n_cmds, n_lits, n = enc(x, block_len, only_sym)
    return PlanarBlocks(sym, count, lit_len, lits, n_cmds, n_lits, n)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_block(sym, count, lit_len, lits, n_cmds, block_len) -> jnp.ndarray:
    B = lits.shape[0]
    C = sym.shape[0]
    c_idx = jnp.arange(C, dtype=jnp.int32)
    real = c_idx < n_cmds

    span = jnp.where(real, lit_len + count, 0)
    cum = jnp.cumsum(span)
    starts = jnp.where(real, cum - span, jnp.iinfo(jnp.int32).max)
    cum_lit = jnp.cumsum(jnp.where(real, lit_len, 0)) - jnp.where(real, lit_len, 0)

    j = jnp.arange(B, dtype=jnp.int32)
    c = (jnp.searchsorted(starts, j, side="right") - 1).astype(jnp.int32)
    c = jnp.clip(c, 0, C - 1)
    within = j - starts[c]
    is_lit = within < lit_len[c]
    lit_idx = jnp.clip(cum_lit[c] + within, 0, B - 1)
    out = jnp.where(is_lit, lits[lit_idx], sym[c])
    return jnp.where(j < block_len, out, 0).astype(jnp.uint8)


@jax.jit
def decode_blocks(pb: PlanarBlocks) -> jnp.ndarray:
    """Decode planar blocks back to ``[nb, B]`` bytes (zero past block_len)."""
    dec = jax.vmap(_decode_block)
    return dec(pb.sym, pb.count, pb.lit_len, pb.lits, pb.n_cmds, pb.block_len)

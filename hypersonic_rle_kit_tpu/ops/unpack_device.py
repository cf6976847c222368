"""Device-side container unpack: payload bytes (HBM) -> planar columns ->
decoded bytes, all in one jit.

The host ships only O(compressed) bytes -- the bit-packed count/lit_len
sections, run symbols and literal bytes, 128-padded per block
(parallel/container.pack_for_device) -- exactly the shape of the
reference's OpenCL decoder, which uploads payload + offset table and
expands on-device (rle8_ocl.c:335-348).  Because serializers emit
container-uniform bit widths (container.serialize_blocks), the unpack is
pure static-shape XLA: bytes -> bit plane (shift/mask) -> reshape
[n, width] -> weighted sum.  No gathers anywhere (XLA gathers lower to
per-element loops on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import decode_sup


def _unpack_wide(packed: jnp.ndarray, width: int, n: int) -> jnp.ndarray:
    """[nb, S] packed bytes -> [nb, n] int32 values of ``width`` bits
    (little-endian bit order, matching container._bitpack)."""
    nb, S = packed.shape
    if width == 0:
        return jnp.zeros((nb, n), jnp.int32)
    assert 8 * S >= n * width, (S, n, width)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = ((packed[:, :, None] >> shifts) & 1)            # [nb, S, 8]
    bits = bits.reshape(nb, 8 * S)[:, : n * width]
    bits = bits.reshape(nb, n, width).astype(jnp.int32)
    weights = (jnp.int32(1) << jnp.arange(width, dtype=jnp.int32))
    return (bits * weights).sum(axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "cnt_bits", "lit_bits", "capacity", "block_size", "min_count",
    "interpret"))
def decode_payload_device(cnts_raw, lls_raw, syms, lits, n_cmds, n_lits,
                          block_len, *, cnt_bits: int, lit_bits: int,
                          capacity: int, block_size: int, min_count: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Payload sections (device arrays) -> decoded [nb, block_size] uint8.

    One jit: on-device bit-unpack of the command columns followed by the
    flagship decode kernel (ops/decode_sup.py)."""
    nb = cnts_raw.shape[0]
    cap = capacity
    n_cmds = n_cmds.astype(jnp.int32)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    cnt_vals = _unpack_wide(cnts_raw, cnt_bits, cap)
    ll_vals = _unpack_wide(lls_raw, lit_bits, cap)
    count = jnp.where(idx < n_cmds[:, None] - 1, cnt_vals + min_count, 0)
    lit_len = jnp.where(idx < n_cmds[:, None], ll_vals, 0)
    return decode_sup.decode_columns_device(
        syms, count, lit_len, lits, n_cmds, n_lits.astype(jnp.int32),
        block_len.astype(jnp.int32), block_size=block_size,
        interpret=interpret)


def _compact_pull(compact: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Distribute a left-compacted stream to its mask positions:
    ``out[i] = compact[rank(i)]`` where ``rank`` counts mask positions
    before i.  The source map is a staircase (increments {0,1}), so this
    is a gather-free log-step pull (ops/shuffle.py); out is junk where
    ``mask`` is False."""
    from . import shuffle
    nb, cap = mask.shape
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - mask.astype(jnp.int32)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    d = idx - rank
    src = compact
    if src.shape[1] < cap:
        src = jnp.pad(src, ((0, 0), (0, cap - src.shape[1])))
    return shuffle.staircase_pull(
        src[:, :cap].reshape(nb, cap // 128, 128).astype(jnp.int32),
        d.reshape(nb, cap // 128, 128)).reshape(nb, cap)


def _two_tier(base_raw, ovf_raw, width, ovf_width, cap, real):
    """Resolve a two-tier column: base values with the all-ones escape
    replaced from the block's overflow list."""
    base = _unpack_wide(base_raw, width, cap)
    if ovf_width == 0 or width == 0:
        return base
    esc = real & (base == (1 << width) - 1)
    ovf = _unpack_wide(ovf_raw, ovf_width, cap)
    return jnp.where(esc, _compact_pull(ovf, esc), base)


@functools.partial(jax.jit, static_argnames=(
    "cnt_bits", "lit_bits", "cnt_ovf_bits", "ll_ovf_bits",
    "capacity", "block_size", "min_count", "interpret"))
def decode_deep_device(cnts_raw, cnt_ovf_raw, lls_raw, ll_ovf_raw,
                       lut_raw, miss_raw, dict7, lits,
                       n_cmds, n_lits, block_len, *,
                       cnt_bits: int, lit_bits: int, cnt_ovf_bits: int,
                       ll_ovf_bits: int, capacity: int, block_size: int,
                       min_count: int, interpret: bool = False):
    """Deep-layout payload sections -> decoded bytes, one jit.

    Resolves the two-tier count/lit_len escapes with gather-free compact
    pulls and the 3-bit symbol-dictionary references with seven plane
    selects (the parallel analog of the reference's MTF LUT decode,
    rleX_Xsl_short.h:2201-2424), then runs the flagship decode kernel."""
    cap = capacity
    n_cmds = n_cmds.astype(jnp.int32)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    is_run = idx < n_cmds[:, None] - 1
    is_cmd = idx < n_cmds[:, None]
    cnt_vals = _two_tier(cnts_raw, cnt_ovf_raw, cnt_bits, cnt_ovf_bits,
                         cap, is_run)
    ll_vals = _two_tier(lls_raw, ll_ovf_raw, lit_bits, ll_ovf_bits,
                        cap, is_cmd)
    count = jnp.where(is_run, cnt_vals + min_count, 0)
    lit_len = jnp.where(is_cmd, ll_vals, 0)
    # symbol resolution: dictionary hits by plane-select, misses pulled
    # from the compacted miss stream
    lut = _unpack_wide(lut_raw, 3, cap)
    sym_hit = jnp.zeros((cnts_raw.shape[0], cap), jnp.int32)
    for k in range(7):
        sym_hit = jnp.where(lut == k + 1,
                            dict7[:, k:k + 1].astype(jnp.int32), sym_hit)
    missm = is_run & (lut == 0)
    sym = jnp.where(missm, _compact_pull(miss_raw, missm), sym_hit)
    return decode_sup.decode_columns_device(
        sym.astype(jnp.uint8), count, lit_len, lits, n_cmds,
        n_lits.astype(jnp.int32), block_len.astype(jnp.int32),
        block_size=block_size, interpret=interpret)


SECTION_KEYS = ("cnts_raw", "lls_raw", "syms", "lits", "cnt_ovf_raw",
                "ll_ovf_raw", "lut_raw", "miss_raw", "dict7",
                "n_cmds", "n_lits", "block_len")


def dispatch_packed(pk: dict, arrs: dict, *, interpret: bool = False):
    """Run the right device decode for a pack_for_device dict whose array
    members (``SECTION_KEYS`` subset) have already been device_put into
    ``arrs``.  Returns the device array (no host fetch)."""
    if pk["info"].deep:
        return decode_deep_device(
            arrs["cnts_raw"], arrs["cnt_ovf_raw"],
            arrs["lls_raw"], arrs["ll_ovf_raw"],
            arrs["lut_raw"], arrs["miss_raw"], arrs["dict7"], arrs["lits"],
            arrs["n_cmds"], arrs["n_lits"], arrs["block_len"],
            cnt_bits=pk["cnt_bits"], lit_bits=pk["lit_bits"],
            cnt_ovf_bits=pk["cnt_ovf_bits"], ll_ovf_bits=pk["ll_ovf_bits"],
            capacity=pk["capacity"], block_size=pk["info"].block_size,
            min_count=pk["info"].min_count, interpret=interpret)
    return decode_payload_device(
        arrs["cnts_raw"], arrs["lls_raw"], arrs["syms"], arrs["lits"],
        arrs["n_cmds"], arrs["n_lits"], arrs["block_len"],
        cnt_bits=pk["cnt_bits"], lit_bits=pk["lit_bits"],
        capacity=pk["capacity"], block_size=pk["info"].block_size,
        min_count=pk["info"].min_count, interpret=interpret)


def decode_packed(pk: dict, *, interpret: bool = False) -> np.ndarray:
    """Convenience host wrapper: pack_for_device dict -> [nb, B] bytes."""
    arrs = {k: jnp.asarray(pk[k]) for k in SECTION_KEYS if k in pk}
    return np.asarray(dispatch_packed(pk, arrs, interpret=interpret))

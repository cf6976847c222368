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


def decode_packed(pk: dict, *, interpret: bool = False) -> np.ndarray:
    """Convenience host wrapper: pack_for_device dict -> [nb, B] bytes."""
    return np.asarray(decode_payload_device(
        jnp.asarray(pk["cnts_raw"]), jnp.asarray(pk["lls_raw"]),
        jnp.asarray(pk["syms"]), jnp.asarray(pk["lits"]),
        jnp.asarray(pk["n_cmds"]), jnp.asarray(pk["n_lits"]),
        jnp.asarray(pk["block_len"]),
        cnt_bits=pk["cnt_bits"], lit_bits=pk["lit_bits"],
        capacity=pk["capacity"], block_size=pk["info"].block_size,
        min_count=pk["info"].min_count, interpret=interpret))

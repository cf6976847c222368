"""HRT1 block container: the TPU-native serialized compressed format.

Generalizes the reference's `rle8m` subsection container
(rle8_low_entropy_cpu.c:126-191: N equal subsections + u32 offset table) into
a columnar, bit-packed block format designed for massively parallel decode:

    header:  magic 'HRT1' | codec u8 | flags u8 | reserved u16
             uncompressed u64 | block_size u32 | n_blocks u32
    table:   per block {payload_bytes u32, n_cmds u32, n_lits u32,
                        cnt_bits u8, lit_bits u8, min_count u8, pad u8}
    payload: per block, concatenated:
             bitpacked (count - min_count) for the n_cmds-1 run commands,
             bitpacked lit_len            for all n_cmds commands,
             run symbols (1 byte each, n_cmds-1),
             literal bytes (n_lits)

Compared with the reference's interleaved varint grammar
([symbol][count][range][literals], rle8_extreme_cpu.h:768-931) the columns
decode with zero sequential dependencies: every field of every command sits at
an offset computable from the table alone, so a TPU grid can unpack blocks
with pure vector shifts and prefix sums.  Bit-widths adapt per block, which on
run-heavy data packs commands tighter than the reference's fixed byte grammar.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

MAGIC = 0x31545248  # 'HRT1'
_HEADER = struct.Struct("<IBBHQII")
_BLOCK = struct.Struct("<IIIBBBB")
DEFAULT_BLOCK_SIZE = 1 << 16
MAX_BLOCKS = 1 << 28
MAX_BLOCK_SIZE = 1 << 24    # allocation bound for hostile headers


class ContainerError(ValueError):
    """Raised for structurally invalid or inconsistent HRT1 containers.

    The reference validates header sizes before decoding
    (rle8_extreme_cpu.h:707-712); HRT1 validates the whole table so hostile
    input cannot drive the planar unpack out of bounds."""


def _bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack uint values into width-bit little-endian fields."""
    if width == 0 or vals.size == 0:
        return b""
    v = vals.astype(np.uint64)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _bitunpack(buf: bytes, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`_bitpack`."""
    if width == 0 or count == 0:
        return np.zeros(count, np.int64)
    total_bits = width * count
    raw = np.frombuffer(buf, np.uint8, count=(total_bits + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little")[:total_bits]
    bits = bits.reshape(count, width).astype(np.int64)
    return (bits << np.arange(width, dtype=np.int64)).sum(axis=1)


def _width_for(max_val: int) -> int:
    return int(max_val).bit_length() if max_val > 0 else 0


@dataclasses.dataclass
class ContainerInfo:
    codec_index: int
    uncompressed_size: int
    block_size: int
    n_blocks: int
    min_count: int


def block_payload(sym_b: np.ndarray, count_b: np.ndarray,
                  lit_len_b: np.ndarray, lits_b: np.ndarray,
                  nc: int, nl: int, min_count: int,
                  cnt_bits: int | None = None,
                  lit_bits: int | None = None) -> tuple[bytes, bytes]:
    """Serialize one block -> (table entry, payload bytes).  Shard-local:
    multi-host encoders serialize only their own blocks with this and ship
    payloads + table entries for ordered assembly (the multi-chip analog of
    the rle8m offset table, rle8_low_entropy_cpu.c:126-191).

    ``cnt_bits``/``lit_bits`` override the per-block minimal widths;
    serializers pass container-uniform maxima so the device can bit-unpack
    every block with one static shape (ops/unpack_device.py)."""
    n_runs = nc - 1
    cnts = count_b[:n_runs].astype(np.int64) - min_count
    lls = lit_len_b[:nc].astype(np.int64)
    if cnt_bits is None:
        cnt_bits = _width_for(int(cnts.max()) if n_runs else 0)
    if lit_bits is None:
        lit_bits = _width_for(int(lls.max()) if nc else 0)
    payload = (_bitpack(cnts, cnt_bits) + _bitpack(lls, lit_bits)
               + sym_b[:n_runs].tobytes() + lits_b[:nl].tobytes())
    entry = _BLOCK.pack(len(payload), nc, nl, cnt_bits, lit_bits,
                        min_count, 0)
    return entry, payload


def assemble(codec_index: int, uncompressed_size: int, block_size: int,
             parts: list[tuple[bytes, bytes]]) -> bytes:
    """Ordered assembly of per-block (table entry, payload) parts into one
    container; ``parts`` must be in block order."""
    head = _HEADER.pack(MAGIC, codec_index, 0, 0,
                        uncompressed_size, block_size, len(parts))
    return (head + b"".join(p[0] for p in parts)
            + b"".join(p[1] for p in parts))


def serialize_blocks(codec_index: int, uncompressed_size: int, block_size: int,
                     min_count: int,
                     sym: np.ndarray, count: np.ndarray, lit_len: np.ndarray,
                     lits: np.ndarray, n_cmds: np.ndarray,
                     n_lits: np.ndarray, *,
                     uniform_bits: bool = True) -> bytes:
    """Serialize planar blocks (numpy views, shapes per ops/planar.py).

    ``uniform_bits`` (default) packs every block's count/lit_len columns at
    the container-wide maximum width instead of each block's minimum: the
    format is unchanged (the table stores widths per block either way) but
    the device decode path can then bit-unpack all blocks with one static
    shape (ops/unpack_device.py), like the reference's OpenCL decoder that
    uploads one uniformly-parsed payload (rle8_ocl.c:335-348).  The size
    cost is fractions of a percent on real data (blocks share run-length
    statistics)."""
    nb = sym.shape[0]
    cnt_bits = lit_bits = None
    if uniform_bits and nb:
        cb = lb = 0
        for b in range(nb):
            nc = int(n_cmds[b])
            if nc > 1:
                cb = max(cb, _width_for(
                    int(count[b, :nc - 1].max()) - min_count))
            if nc:
                lb = max(lb, _width_for(int(lit_len[b, :nc].max())))
        cnt_bits, lit_bits = cb, lb
    parts = [block_payload(sym[b], count[b], lit_len[b], lits[b],
                           int(n_cmds[b]), int(n_lits[b]), min_count,
                           cnt_bits, lit_bits)
             for b in range(nb)]
    return assemble(codec_index, uncompressed_size, block_size, parts)


def pack_for_device(buf: bytes, parsed=None):
    """Slice a container into padded per-section numpy arrays for the
    device unpack path: the accelerator receives O(compressed) bytes (the
    payload sections, 128-padded per block) plus the table, and bit-unpacks
    the command columns itself (ops/unpack_device.py) -- the shape of the
    reference's OpenCL decoder, which uploads only payload + offset table
    (rle8_ocl.c:335-348).

    Host work here is boundary memcpys only (no bit manipulation).
    Returns None when the container's bit widths are not uniform across
    blocks (serializers emit uniform widths by default; see
    serialize_blocks) -- callers fall back to the host unpack.
    """
    info, blocks = parsed if parsed is not None else parse(buf)
    nb = info.n_blocks
    if nb == 0:
        return None
    if (len({bl["cnt_bits"] for bl in blocks}) > 1
            or len({bl["lit_bits"] for bl in blocks}) > 1):
        return None
    cnt_bits = blocks[0]["cnt_bits"]
    lit_bits = blocks[0]["lit_bits"]
    cap = max(bl["n_cmds"] for bl in blocks)
    cap = (cap + 127) // 128 * 128
    pad128 = lambda n: (n + 127) // 128 * 128
    CS = pad128(max((cnt_bits * cap + 7) // 8, 1))
    LS = pad128(max((lit_bits * cap + 7) // 8, 1))
    B = info.block_size
    mv = memoryview(buf)
    cnts_raw = np.zeros((nb, CS), np.uint8)
    lls_raw = np.zeros((nb, LS), np.uint8)
    syms = np.zeros((nb, cap), np.uint8)
    lits = np.zeros((nb, B), np.uint8)
    n_cmds = np.empty(nb, np.int32)
    n_lits = np.empty(nb, np.int32)
    for b, bl in enumerate(blocks):
        nc, nl = bl["n_cmds"], bl["n_lits"]
        n_runs = nc - 1
        p = bl["payload_off"]
        cb = (cnt_bits * n_runs + 7) // 8
        lb = (lit_bits * nc + 7) // 8
        cnts_raw[b, :cb] = np.frombuffer(mv[p:p + cb], np.uint8)
        p += cb
        lls_raw[b, :lb] = np.frombuffer(mv[p:p + lb], np.uint8)
        p += lb
        syms[b, :n_runs] = np.frombuffer(mv[p:p + n_runs], np.uint8)
        p += n_runs
        lits[b, :nl] = np.frombuffer(mv[p:p + nl], np.uint8)
        n_cmds[b] = nc
        n_lits[b] = nl
    block_len = np.full(nb, B, np.int32)
    block_len[-1] = info.uncompressed_size - (nb - 1) * B
    return dict(info=info, cnt_bits=cnt_bits, lit_bits=lit_bits,
                capacity=cap, cnts_raw=cnts_raw, lls_raw=lls_raw,
                syms=syms, lits=lits, n_cmds=n_cmds, n_lits=n_lits,
                block_len=block_len)


def parse(buf: bytes) -> tuple[ContainerInfo, list[dict]]:
    """Parse and validate header + table; payload slices are returned lazily
    as memoryview offsets so multi-host consumers can fetch only their shard.

    Raises :class:`ContainerError` on any structural inconsistency: short
    buffer, implausible counts, bit widths over 32, or per-block payload
    sizes that disagree with the fields they must contain.
    """
    if len(buf) < _HEADER.size:
        raise ContainerError("truncated header")
    magic, codec, _flags, _rsv, usize, bsize, nb = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ContainerError("not an HRT1 container")
    if bsize <= 0 or bsize > MAX_BLOCK_SIZE or nb < 0 or nb > MAX_BLOCKS:
        raise ContainerError(f"implausible geometry: block_size={bsize} "
                             f"n_blocks={nb}")
    if usize > nb * bsize or (nb and usize <= (nb - 1) * bsize):
        raise ContainerError(f"uncompressed size {usize} inconsistent with "
                             f"{nb} x {bsize} blocks")
    off = _HEADER.size
    if len(buf) < off + _BLOCK.size * nb:
        raise ContainerError("truncated block table")
    blocks = []
    payload_off = off + _BLOCK.size * nb
    min_count = 6
    for b in range(nb):
        pbytes, nc, nl, cnt_bits, lit_bits, min_count, _ = _BLOCK.unpack_from(
            buf, off + b * _BLOCK.size)
        if nc < 1 or nc > bsize + 1:
            raise ContainerError(f"block {b}: n_cmds {nc} out of range")
        if nl > bsize:
            raise ContainerError(f"block {b}: n_lits {nl} > block size")
        if cnt_bits > 32 or lit_bits > 32:
            raise ContainerError(f"block {b}: bit width > 32")
        expect = ((cnt_bits * (nc - 1) + 7) // 8 + (lit_bits * nc + 7) // 8
                  + (nc - 1) + nl)
        if pbytes != expect:
            raise ContainerError(f"block {b}: payload {pbytes} bytes, "
                                 f"fields need {expect}")
        if payload_off + pbytes > len(buf):
            raise ContainerError(f"block {b}: payload past end of buffer")
        blocks.append(dict(payload_off=payload_off, payload_bytes=pbytes,
                           n_cmds=nc, n_lits=nl, cnt_bits=cnt_bits,
                           lit_bits=lit_bits))
        payload_off += pbytes
    info = ContainerInfo(codec, usize, bsize, nb, min_count)
    return info, blocks


def deserialize_to_planar(buf: bytes, capacity: int | None = None):
    """Unpack an HRT1 container into padded planar numpy arrays
    (sym, count, lit_len, lits, n_cmds, n_lits, block_len) + ContainerInfo."""
    info, blocks = parse(buf)
    nb, B = info.n_blocks, info.block_size
    if capacity is None:
        cap = max((bl["n_cmds"] for bl in blocks), default=1)
        capacity = (cap + 127) // 128 * 128
    n_cmds = np.array([bl["n_cmds"] for bl in blocks], np.int32)
    n_lits = np.array([bl["n_lits"] for bl in blocks], np.int32)
    block_len = np.full(nb, B, np.int32)
    if nb:
        block_len[-1] = info.uncompressed_size - (nb - 1) * B
    if nb:
        from ..utils import native
        cols = native.unpack_container(
            np.frombuffer(buf, np.uint8),
            np.array([bl["payload_off"] for bl in blocks], np.int64),
            n_cmds, n_lits,
            np.array([bl["cnt_bits"] for bl in blocks], np.int32),
            np.array([bl["lit_bits"] for bl in blocks], np.int32),
            capacity, B, info.min_count)
        if cols is not None:
            return info, (*cols, n_cmds, n_lits, block_len)
    sym = np.zeros((nb, capacity), np.uint8)
    count = np.zeros((nb, capacity), np.int32)
    lit_len = np.zeros((nb, capacity), np.int32)
    lits = np.zeros((nb, B), np.uint8)
    n_cmds = np.zeros(nb, np.int32)
    n_lits = np.zeros(nb, np.int32)
    block_len = np.full(nb, B, np.int32)
    if nb:
        rem = info.uncompressed_size - (nb - 1) * B
        block_len[-1] = rem
    mv = memoryview(buf)
    for b, bl in enumerate(blocks):
        nc, nl = bl["n_cmds"], bl["n_lits"]
        n_runs = nc - 1
        p = bl["payload_off"]
        cnt_bytes = (bl["cnt_bits"] * n_runs + 7) // 8
        lit_bytes = (bl["lit_bits"] * nc + 7) // 8
        cnts = _bitunpack(mv[p:p + cnt_bytes], bl["cnt_bits"], n_runs)
        p += cnt_bytes
        lls = _bitunpack(mv[p:p + lit_bytes], bl["lit_bits"], nc)
        p += lit_bytes
        sym[b, :n_runs] = np.frombuffer(mv[p:p + n_runs], np.uint8)
        p += n_runs
        lits[b, :nl] = np.frombuffer(mv[p:p + nl], np.uint8)
        count[b, :n_runs] = cnts + info.min_count
        lit_len[b, :nc] = lls
        n_cmds[b] = nc
        n_lits[b] = nl
    return info, (sym, count, lit_len, lits, n_cmds, n_lits, block_len)

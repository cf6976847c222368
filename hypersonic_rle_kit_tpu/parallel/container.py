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


def serialize_blocks(codec_index: int, uncompressed_size: int, block_size: int,
                     min_count: int,
                     sym: np.ndarray, count: np.ndarray, lit_len: np.ndarray,
                     lits: np.ndarray, n_cmds: np.ndarray,
                     n_lits: np.ndarray) -> bytes:
    """Serialize planar blocks (numpy views, shapes per ops/planar.py)."""
    nb = sym.shape[0]
    head = _HEADER.pack(MAGIC, codec_index, 0, 0,
                        uncompressed_size, block_size, nb)
    table = bytearray()
    payloads = bytearray()
    for b in range(nb):
        nc = int(n_cmds[b])
        nl = int(n_lits[b])
        n_runs = nc - 1
        cnts = count[b, :n_runs].astype(np.int64) - min_count
        lls = lit_len[b, :nc].astype(np.int64)
        cnt_bits = _width_for(int(cnts.max()) if n_runs else 0)
        lit_bits = _width_for(int(lls.max()) if nc else 0)
        payload = (_bitpack(cnts, cnt_bits) + _bitpack(lls, lit_bits)
                   + sym[b, :n_runs].tobytes() + lits[b, :nl].tobytes())
        table += _BLOCK.pack(len(payload), nc, nl, cnt_bits, lit_bits,
                             min_count, 0)
        payloads += payload
    return head + bytes(table) + bytes(payloads)


def parse(buf: bytes) -> tuple[ContainerInfo, list[dict]]:
    """Parse header + table; payload slices are returned lazily as memoryview
    offsets so multi-host consumers can fetch only their shard."""
    magic, codec, _flags, _rsv, usize, bsize, nb = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("not an HRT1 container")
    off = _HEADER.size
    blocks = []
    payload_off = off + _BLOCK.size * nb
    min_count = 6
    for b in range(nb):
        pbytes, nc, nl, cnt_bits, lit_bits, min_count, _ = _BLOCK.unpack_from(
            buf, off + b * _BLOCK.size)
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

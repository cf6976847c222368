"""Device encode/decode vs the golden host planar codec."""

import numpy as np
import pytest

import fuzz_inputs
from hypersonic_rle_kit_tpu.ops import device, planar


def _blocks_of(data: bytes, block_size: int, pad_nb: int | None = None):
    """Split into fixed-size blocks; pad the block count to a power of two so
    jit compiles once per (nb, block_size) bucket instead of per input."""
    arr = np.frombuffer(data, np.uint8)
    nb = max(1, -(-arr.size // block_size))
    if pad_nb is None:
        pad_nb = 1 << (nb - 1).bit_length()
    padded = np.zeros(pad_nb * block_size, np.uint8)
    padded[:arr.size] = arr
    lens = np.zeros(pad_nb, np.int32)
    lens[:nb] = block_size
    if arr.size % block_size:
        lens[nb - 1] = arr.size % block_size
    if arr.size == 0:
        lens[0] = 0
    return padded.reshape(pad_nb, block_size), lens


@pytest.mark.parametrize("block_size", [256, 4096])
def test_device_encode_matches_host(block_size):
    cap = planar.capacity_for(block_size, 6)
    for data in fuzz_inputs.corpus(count=4)[:6]:
        data = data[:64 * 1024]   # bound the per-block golden-model loop
        x, lens = _blocks_of(data, block_size)
        pb = device.encode_blocks(x, lens, capacity=cap, min_count=6)
        sym, count, lit_len, lits, n_cmds, n_lits = (
            np.asarray(pb.sym), np.asarray(pb.count), np.asarray(pb.lit_len),
            np.asarray(pb.lits), np.asarray(pb.n_cmds), np.asarray(pb.n_lits))
        for b in range(x.shape[0]):
            g = planar.host_encode_block(x[b, :lens[b]], cap, block_size, 6)
            gs, gc, gl, glits, gn, gnl, _ = g
            n = int(n_cmds[b])
            assert n == int(gn), (b, n, int(gn))
            np.testing.assert_array_equal(sym[b, :n], gs[:n])
            np.testing.assert_array_equal(count[b, :n], gc[:n])
            np.testing.assert_array_equal(lit_len[b, :n], gl[:n])
            nl = int(n_lits[b])
            assert nl == int(gnl)
            np.testing.assert_array_equal(lits[b, :nl], glits[:nl])


@pytest.mark.parametrize("block_size", [4096, 65536])
def test_device_roundtrip(block_size):
    cap = planar.capacity_for(block_size, 6)
    for data in fuzz_inputs.corpus(count=6)[:10]:
        x, lens = _blocks_of(data, block_size)
        pb = device.encode_blocks(x, lens, capacity=cap, min_count=6)
        y = np.asarray(device.decode_blocks(pb))
        mask = np.arange(block_size)[None, :] < lens[:, None]
        out = y[mask].tobytes()
        assert out == data, f"roundtrip mismatch bs={block_size} len={len(data)}"


def test_device_decode_matches_host_decoder():
    block_size, cap = 4096, planar.capacity_for(4096, 6)
    rng = np.random.default_rng(3)
    data = fuzz_inputs.make_input(rng, n_sections=12)
    x, lens = _blocks_of(data, block_size)
    pb = device.encode_blocks(x, lens, capacity=cap, min_count=6)
    y = np.asarray(device.decode_blocks(pb))
    sym, count, lit_len, lits, n_cmds, blen = (
        np.asarray(pb.sym), np.asarray(pb.count), np.asarray(pb.lit_len),
        np.asarray(pb.lits), np.asarray(pb.n_cmds), np.asarray(pb.block_len))
    for b in range(x.shape[0]):
        host = planar.host_decode_block(
            sym[b], count[b], lit_len[b], lits[b], int(n_cmds[b]), int(blen[b]))
        np.testing.assert_array_equal(y[b, :lens[b]], host)

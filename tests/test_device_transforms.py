"""Device bitpack / MMTF / Bit-MMTF kernels and the low-entropy device
decoder (the OpenCL-decoder analog, rle8_ocl.c:265-413)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hypersonic_rle_kit_tpu.formats import low_entropy as le
from hypersonic_rle_kit_tpu.formats import mmtf as mmtf_host
from hypersonic_rle_kit_tpu.ops import bitpack, low_entropy_device as led
from hypersonic_rle_kit_tpu.ops import mmtf_device as md


@pytest.mark.parametrize("width", [1, 2, 3, 4])
def test_bitpack_roundtrip(width):
    rng = np.random.default_rng(width)
    n = 24 * 16                      # multiple of 8 for every width
    x = rng.integers(0, 1 << width, (3, n), dtype=np.uint8)
    packed = np.asarray(bitpack.pack_device(jnp.asarray(x), width=width))
    assert packed.shape == (3, bitpack.packed_size(n, width))
    un = np.asarray(bitpack.unpack_device(jnp.asarray(packed), width=width,
                                          n_values=n))
    np.testing.assert_array_equal(un, x)
    # device matches the numpy golden bit-for-bit
    np.testing.assert_array_equal(packed, bitpack.pack_np(x, width))
    np.testing.assert_array_equal(bitpack.unpack_np(packed, width, n), x)


def test_bitpack_density():
    # 4-bit packing halves the bytes; 1-bit is 8x
    n = 128
    assert bitpack.packed_size(n, 4) == n // 2
    assert bitpack.packed_size(n, 1) == n // 8


@pytest.mark.parametrize("lanes", [16, 32])
def test_mmtf_device_matches_host(lanes):
    rng = np.random.default_rng(lanes)
    n = lanes * 37
    data = rng.integers(0, 7, n, dtype=np.uint8).tobytes()
    enc_host = mmtf_host._mmtf(data, lanes, encode=True)
    enc_dev = np.asarray(md.mmtf_device(
        jnp.asarray(np.frombuffer(data, np.uint8)[None]),
        lanes=lanes, encode=True))[0].tobytes()
    assert enc_dev == enc_host
    dec_dev = np.asarray(md.mmtf_device(
        jnp.asarray(np.frombuffer(enc_dev, np.uint8)[None]),
        lanes=lanes, encode=False))[0].tobytes()
    assert dec_dev == data


def test_mmtf_device_block_parallel():
    # blocks are independent chains: batched == per-block
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, (4, 16 * 8), dtype=np.uint8)
    batched = np.asarray(md.mmtf_device(jnp.asarray(x), lanes=16))
    for b in range(4):
        single = np.asarray(md.mmtf_device(jnp.asarray(x[b:b + 1]), lanes=16))
        np.testing.assert_array_equal(batched[b], single[0])


def test_mmtf_transform_partial_tail():
    # arbitrary length incl. the no-update tail lookup (mmtf.c:161-175)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 9, 16 * 5 + 11, dtype=np.uint8).tobytes()
    enc = md.mmtf_transform(data, lanes=16, encode=True)
    assert enc == mmtf_host.mmtf128_encode(data)
    assert md.mmtf_transform(enc, lanes=16, encode=False) == data


@pytest.mark.parametrize("unit", [1, 2])
def test_bitmmtf_device(unit):
    rng = np.random.default_rng(unit)
    x = rng.integers(0, 256, (2, 64 * unit), dtype=np.uint8)
    enc = md.bitmmtf_encode_device(jnp.asarray(x), unit=unit)
    dec = np.asarray(md.bitmmtf_decode_device(enc, unit=unit))
    np.testing.assert_array_equal(dec, x)
    # single block matches the host (reference-exact) transform
    host = mmtf_host.bitmmtf8_encode(x[0].tobytes()) if unit == 1 \
        else mmtf_host.bitmmtf16_encode(x[0].tobytes())
    assert np.asarray(enc)[0].tobytes() == host


def _le_sample(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 5, n, dtype=np.uint8)
    runs = rng.integers(0, n - 600, 20)
    for s in runs:
        arr[s:s + int(rng.integers(3, 500))] = int(rng.integers(0, 4))
    return arr.tobytes()


def test_le_decompress_device():
    data = _le_sample()
    comp = le.le_compress(data)
    assert led.le_decompress_device(comp) == data
    comp_s = le.le_compress(data, short=True)
    assert led.le_decompress_device(comp_s) == data


@pytest.mark.parametrize("subs", [1, 3, 8])
def test_rle8m_decompress_device(subs):
    data = _le_sample(n=9001, seed=subs)
    comp = le.rle8m_compress(subs, data)
    assert led.rle8m_decompress_device(comp) == data
    assert le.rle8m_decompress(comp) == data

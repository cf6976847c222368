"""Byte-parity tests for the 8-bit RLE family vs the reference library."""

import pytest

import fuzz_inputs
import ref_oracle
from hypersonic_rle_kit_tpu.formats import rle8

# codec_t indices (codec_funcs.h): 0 = 8 Bit, 2 = 8 Bit Packed,
# 8 = 8 Bit Single, 10 = 8 Bit Single Packed
CASES = [
    (0, dict(packed=False, single=False)),
    (2, dict(packed=True, single=False)),
    (8, dict(packed=False, single=True)),
    (10, dict(packed=True, single=True)),
]

CORPUS = fuzz_inputs.corpus()

requires_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference oracle unavailable")


@pytest.mark.parametrize("codec,kw", CASES)
def test_roundtrip(codec, kw):
    for data in CORPUS:
        comp = rle8.rle8_compress(data, **kw)
        assert comp, f"compress failed for len={len(data)}"
        dec = rle8.rle8_decompress(comp, packed=kw["packed"])
        assert dec == data, f"roundtrip mismatch len={len(data)}"


@requires_ref
@pytest.mark.parametrize("codec,kw", CASES)
def test_compress_byte_parity(codec, kw):
    for data in CORPUS:
        ours = rle8.rle8_compress(data, **kw)
        ref = ref_oracle.ref_compress(codec, data)
        assert ours == ref, (
            f"compress parity mismatch codec={codec} len={len(data)} "
            f"ours={len(ours)}B ref={len(ref)}B "
            f"first_diff={next((i for i in range(min(len(ours), len(ref))) if ours[i] != ref[i]), -1)}")


@requires_ref
@pytest.mark.parametrize("codec,kw", CASES)
def test_decompress_parity_of_ref_streams(codec, kw):
    """Our decoder must accept reference-produced streams."""
    for data in CORPUS:
        ref = ref_oracle.ref_compress(codec, data)
        dec = rle8.rle8_decompress(ref, packed=kw["packed"])
        assert dec == data

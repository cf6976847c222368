"""Byte-parity tests for the 16/32/64-bit generic RLE family."""

import pytest

import fuzz_inputs
import ref_oracle
from hypersonic_rle_kit_tpu import spec
from hypersonic_rle_kit_tpu.formats import rlex

NAMES = [
    "16 Bit (Symbol)", "16 Bit Packed (Symbol)",
    "16 Bit (Byte)", "16 Bit Packed (Byte)",
    "32 Bit (Symbol)", "32 Bit Packed (Symbol)",
    "32 Bit (Byte)", "32 Bit Packed (Byte)",
    "64 Bit (Symbol)", "64 Bit Packed (Symbol)",
    "64 Bit (Byte)", "64 Bit Packed (Byte)",
    "24 Bit (Symbol)", "24 Bit Packed (Symbol)",
    "24 Bit (Byte)", "24 Bit Packed (Byte)",
    "48 Bit (Symbol)", "48 Bit Packed (Symbol)",
    "48 Bit (Byte)", "48 Bit Packed (Byte)",
]

CORPUS = fuzz_inputs.corpus(count=30)

requires_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference oracle unavailable")


def _kw(s):
    return dict(width=s.width, byte_aligned=s.byte_aligned, packed=s.packed)


@pytest.mark.parametrize("name", NAMES)
def test_roundtrip(name):
    s = spec.by_name(name)
    for data in CORPUS:
        comp = rlex.rlex_compress(data, **_kw(s))
        assert comp
        dec = rlex.rlex_decompress(comp, **_kw(s))
        assert dec == data, f"{name} roundtrip len={len(data)}"


@requires_ref
@pytest.mark.parametrize("name", NAMES)
def test_compress_byte_parity(name):
    s = spec.by_name(name)
    for data in CORPUS:
        ours = rlex.rlex_compress(data, **_kw(s))
        ref = ref_oracle.ref_compress(s.index, data)
        assert ours == ref, (
            f"{name} parity len={len(data)} ours={len(ours)} ref={len(ref)} "
            f"first_diff={next((i for i in range(min(len(ours), len(ref))) if ours[i] != ref[i]), -1)}")


@requires_ref
@pytest.mark.parametrize("name", NAMES)
def test_decompress_ref_streams(name):
    s = spec.by_name(name)
    for data in CORPUS[:10]:
        ref = ref_oracle.ref_compress(s.index, data)
        assert rlex.rlex_decompress(ref, **_kw(s)) == data

"""Byte-parity tests for the 3LUT/7LUT (non-Short) family."""

import pytest

import fuzz_inputs
import ref_oracle
from hypersonic_rle_kit_tpu import spec
from hypersonic_rle_kit_tpu.formats import lut

NAMES = (
    ["8 Bit 3LUT", "8 Bit 7LUT"]
    + [f"{w} Bit {l}LUT ({a})" for w in (16, 24, 32, 48, 64)
       for l in (3, 7) for a in ("Symbol", "Byte")]
)

CORPUS = fuzz_inputs.corpus(count=25)

requires_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference oracle unavailable")


def _kw(s):
    return dict(width=s.width, lut=s.lut, byte_aligned=s.byte_aligned)


@pytest.mark.parametrize("name", NAMES)
def test_roundtrip(name):
    s = spec.by_name(name)
    for data in CORPUS:
        comp = lut.lut_compress(data, **_kw(s))
        assert comp
        dec = lut.lut_decompress(comp, **_kw(s))
        assert dec == data, f"{name} roundtrip len={len(data)}"


@requires_ref
@pytest.mark.parametrize("name", NAMES)
def test_compress_byte_parity(name):
    s = spec.by_name(name)
    for data in CORPUS:
        ours = lut.lut_compress(data, **_kw(s))
        ref = ref_oracle.ref_compress(s.index, data)
        assert ours == ref, (
            f"{name} parity len={len(data)} ours={len(ours)} ref={len(ref)} "
            f"first_diff={next((i for i in range(min(len(ours), len(ref))) if ours[i] != ref[i]), -1)}")


@requires_ref
@pytest.mark.parametrize("name", NAMES)
def test_decompress_ref_streams(name):
    s = spec.by_name(name)
    for data in CORPUS[:8]:
        ref = ref_oracle.ref_compress(s.index, data)
        assert lut.lut_decompress(ref, **_kw(s)) == data

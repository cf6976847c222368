"""Byte-parity tests for the Short family (0/1/3/7 LUT, Single, Greedy)."""

import pytest

import fuzz_inputs
import ref_oracle
from hypersonic_rle_kit_tpu import spec
from hypersonic_rle_kit_tpu.formats import short

NAMES = (
    ["8 Bit Short", "8 Bit 1LUT Short", "8 Bit 3LUT Short", "8 Bit 7LUT Short",
     "8 Bit Single Short"]
    + [f"{w} Bit{'' if l is None else f' {l}LUT'} Short ({a})"
       for w in (16, 24, 32, 48, 64) for l in (None, 1, 3, 7)
       for a in ("Symbol", "Byte")]
)
GREEDY_NAMES = [f"{w} Bit {l}LUT Short Grdy (Byte)"
                for w in (16, 24, 32, 48, 64) for l in (1, 3, 7)]

CORPUS = fuzz_inputs.corpus(count=25)
GREEDY_CORPUS = fuzz_inputs.corpus(count=6)[:10]

requires_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference oracle unavailable")


def _kw(s):
    return dict(width=s.width, lut=s.lut, byte_aligned=s.byte_aligned,
                single=s.single)


@pytest.mark.parametrize("name", NAMES)
def test_roundtrip(name):
    s = spec.by_name(name)
    for data in CORPUS:
        comp = short.short_compress(data, greedy=False, **_kw(s))
        assert comp
        dec = short.short_decompress(comp, width=s.width, lut=s.lut,
                                     byte_aligned=s.byte_aligned,
                                     single=s.single)
        assert dec == data, f"{name} roundtrip len={len(data)}"


@requires_ref
@pytest.mark.parametrize("name", NAMES)
def test_compress_byte_parity(name):
    s = spec.by_name(name)
    for data in CORPUS:
        ours = short.short_compress(data, greedy=False, **_kw(s))
        ref = ref_oracle.ref_compress(s.index, data)
        assert ours == ref, (
            f"{name} parity len={len(data)} ours={len(ours)} ref={len(ref)} "
            f"first_diff={next((i for i in range(min(len(ours), len(ref))) if ours[i] != ref[i]), -1)}")


@requires_ref
@pytest.mark.parametrize("name", GREEDY_NAMES)
def test_greedy_parity(name):
    s = spec.by_name(name)
    for data in GREEDY_CORPUS:
        ours = short.short_compress(data, greedy=True, **_kw(s))
        ref = ref_oracle.ref_compress(s.index, data)
        assert ours == ref, (
            f"{name} parity len={len(data)} ours={len(ours)} ref={len(ref)} "
            f"first_diff={next((i for i in range(min(len(ours), len(ref))) if ours[i] != ref[i]), -1)}")
        dec = short.short_decompress(ours, width=s.width, lut=s.lut,
                                     byte_aligned=True)
        assert dec == data


@requires_ref
@pytest.mark.parametrize("name", NAMES[:10])
def test_decompress_ref_streams(name):
    s = spec.by_name(name)
    for data in CORPUS[:6]:
        ref = ref_oracle.ref_compress(s.index, data)
        dec = short.short_decompress(ref, width=s.width, lut=s.lut,
                                     byte_aligned=s.byte_aligned,
                                     single=s.single)
        assert dec == data

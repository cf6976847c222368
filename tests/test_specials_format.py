"""Parity tests for transforms and low-entropy codecs (+ rle8m container)."""

import pytest

import fuzz_inputs
import ref_oracle
from hypersonic_rle_kit_tpu.formats import low_entropy as le
from hypersonic_rle_kit_tpu.formats import mmtf

CORPUS = fuzz_inputs.corpus(count=10)

requires_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference oracle unavailable")

MMTF_CASES = [
    ("Multi MTF 128 Bit (Transform)", 116, mmtf.mmtf128_encode, mmtf.mmtf128_decode),
    ("Multi MTF 256 Bit (Transform)", 117, mmtf.mmtf256_encode, mmtf.mmtf256_decode),
    ("Bit MMTF 8 Bit (Transform)", 118, mmtf.bitmmtf8_encode, mmtf.bitmmtf8_decode),
    ("Bit MMTF 16 Bit (Transform)", 119, mmtf.bitmmtf16_encode, mmtf.bitmmtf16_decode),
]

LE_CASES = [
    ("Low Entropy", 112, dict(short=False, single=False)),
    ("Low Entropy Single", 113, dict(short=False, single=True)),
    ("Low Entropy Short", 114, dict(short=True, single=False)),
    ("Low Entropy Short Single", 115, dict(short=True, single=True)),
]


@pytest.mark.parametrize("name,idx,enc,dec", MMTF_CASES)
def test_mmtf_roundtrip(name, idx, enc, dec):
    for data in CORPUS:
        t = enc(data)
        assert len(t) == len(data)
        assert dec(t) == data


@requires_ref
@pytest.mark.parametrize("name,idx,enc,dec", MMTF_CASES)
def test_mmtf_parity(name, idx, enc, dec):
    for data in CORPUS[:6]:
        assert enc(data) == ref_oracle.ref_compress(idx, data), name


@pytest.mark.parametrize("name,idx,kw", LE_CASES)
def test_le_roundtrip(name, idx, kw):
    for data in CORPUS:
        comp = le.le_compress(data, **kw)
        assert le.le_decompress(comp, short=kw["short"]) == data


@requires_ref
@pytest.mark.parametrize("name,idx,kw", LE_CASES)
def test_le_parity(name, idx, kw):
    for data in CORPUS:
        ours = le.le_compress(data, **kw)
        ref = ref_oracle.ref_compress(idx, data)
        assert ours == ref, (
            f"{name} len={len(data)} ours={len(ours)} ref={len(ref)}")


def test_rle8m_roundtrip():
    for data in CORPUS[:6]:
        for subs in (1, 2, 7):
            comp = le.rle8m_compress(subs, data)
            assert le.rle8m_decompress(comp) == data


SH_MMTF_CASES = [("8 Bit RLE + Huffman-esque", 110), ("8 Bit MMTF 128", 111)]


@requires_ref
@pytest.mark.parametrize("name,idx", SH_MMTF_CASES)
def test_sh_mmtf_parity(name, idx):
    from hypersonic_rle_kit_tpu.formats import registry
    for data in CORPUS:
        ours = registry.compress(data, name)
        ref = ref_oracle.ref_compress(idx, data)
        assert ours == ref, f"{name} len={len(data)}"
        assert registry.decompress(ours, name) == data


@requires_ref
def test_all_120_codecs_roundtrip_and_parity():
    """The capstone: every codec in the registry, byte-for-byte."""
    from hypersonic_rle_kit_tpu import spec
    from hypersonic_rle_kit_tpu.formats import registry
    data = CORPUS[0][:40000]
    for s in spec.REGISTRY:
        if s.family is spec.Family.MEMCPY:
            continue
        ours = registry.compress(data, s)
        ref = ref_oracle.ref_compress(s.index, data)
        assert ours == ref, f"{s.name} parity"
        assert registry.decompress(ours, s) == data, f"{s.name} roundtrip"

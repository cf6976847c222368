"""Byte-parity tests for the 128-bit RLE family."""

import numpy as np
import pytest

import fuzz_inputs
import ref_oracle
from hypersonic_rle_kit_tpu import spec
from hypersonic_rle_kit_tpu.formats import rle128

NAMES = ["128 Bit (Symbol)", "128 Bit Packed (Symbol)",
         "128 Bit (Byte)", "128 Bit Packed (Byte)"]

# add 16-byte-periodic sections to exercise vector-symbol runs
def _corpus():
    base = fuzz_inputs.corpus(count=20, max_symbol_len=16)
    rng = np.random.default_rng(77)
    extra = []
    for _ in range(8):
        parts = []
        for _ in range(5):
            sym = rng.integers(0, 256, 16, dtype=np.uint8)
            reps = int(rng.choice([1, 2, 3, 4, 20, 100]))
            parts.append(np.tile(sym, reps))
            parts.append(rng.integers(0, 256, int(rng.integers(0, 70)),
                                      dtype=np.uint8))
        extra.append(np.concatenate(parts).tobytes())
    # 17..33-byte same-byte runs (stale-symbol re-match corner)
    for L in (17, 18, 31, 32, 33, 48):
        extra.append(b"x" * 40 + b"\x55" * L + b"y" * 40)
    return base + extra


CORPUS = _corpus()

requires_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference oracle unavailable")


def _kw(s):
    return dict(byte_aligned=s.byte_aligned, packed=s.packed)


@pytest.mark.parametrize("name", NAMES)
def test_roundtrip(name):
    s = spec.by_name(name)
    for data in CORPUS:
        comp = rle128.rle128_compress(data, **_kw(s))
        assert comp
        assert rle128.rle128_decompress(comp, **_kw(s)) == data


@requires_ref
@pytest.mark.parametrize("name", NAMES)
def test_compress_byte_parity(name):
    s = spec.by_name(name)
    for data in CORPUS:
        ours = rle128.rle128_compress(data, **_kw(s))
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
        assert rle128.rle128_decompress(ref, **_kw(s)) == data

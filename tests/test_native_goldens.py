"""Native fast decoders (csrc) vs the pure-Python goldens.

The Python format decoders are the byte-parity goldens (pinned to the C
reference by the parity suites); the native LE/SH/MMTF paths must match
them bit for bit on every input, including section-overshoot and
recency-model corners.  Monkeypatching the native entry points forces the
Python path for the comparison."""

import numpy as np
import pytest

from hypersonic_rle_kit_tpu.formats import low_entropy as LE
from hypersonic_rle_kit_tpu.formats import mmtf as M
from hypersonic_rle_kit_tpu.formats import sh as SH
from hypersonic_rle_kit_tpu.utils import native

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native runtime unavailable")


def _py(monkeypatch, fn, *args):
    monkeypatch.setattr(native, "mmtf", lambda *a, **k: None)
    monkeypatch.setattr(native, "sh_decode", lambda *a, **k: None)
    monkeypatch.setattr(native, "le_decode_into", lambda *a, **k: None)
    out = fn(*args)
    monkeypatch.undo()
    return out


def _inputs():
    rng = np.random.default_rng(42)
    out = []
    for trial in range(25):
        n = int(rng.integers(1, 9000))
        d = rng.integers(0, 256, n, dtype=np.uint8)
        d[rng.random(n) < rng.random()] = int(rng.integers(0, 4))
        out.append(d.tobytes())
    out.append(b"\x00" * 5000)          # one-symbol stream
    out.append(bytes(range(256)) * 4)   # all literals
    return out


@pytest.mark.parametrize("lanes", [16, 32])
def test_mmtf_native_matches_python(monkeypatch, lanes):
    for data in _inputs():
        enc_n = M._mmtf(data, lanes, True)
        enc_p = _py(monkeypatch, M._mmtf, data, lanes, True)
        assert enc_n == enc_p
        assert M._mmtf(enc_n, lanes, False) == data


def test_le_native_matches_python(monkeypatch):
    for data in _inputs():
        for short in (False, True):
            c = LE.le_compress(data, short=short)
            if not c:
                continue
            assert LE.le_decompress(c, short=short) == \
                _py(monkeypatch, LE.le_decompress, c)


def test_rle8m_native_matches_python(monkeypatch):
    for data in _inputs():
        for subs in (1, 3, 7):
            c = LE.rle8m_compress(subs, data)
            if not c:
                continue
            assert LE.rle8m_decompress(c) == \
                _py(monkeypatch, LE.rle8m_decompress, c)


def test_sh_native_matches_python(monkeypatch):
    for data in _inputs():
        c = SH.sh_compress(data)
        if not c:
            continue
        assert SH.sh_decompress(c) == _py(monkeypatch, SH.sh_decompress, c)


def test_sh_native_truncation_no_crash(monkeypatch):
    """A truncated SH stream must never crash or read out of bounds: the
    native decoder either signals malformed (None -> Python fallback) or
    produces exactly what the Python golden produces from the same
    overlapping cursors."""
    data = bytes(np.random.default_rng(1).integers(0, 5, 4000,
                                                   dtype=np.uint8))
    c = bytearray(SH.sh_compress(data))
    for cut in (9, len(c) // 2, len(c) - 1):
        t = bytes(c[:4]) + int.to_bytes(cut, 4, "little") + bytes(c[8:cut])
        got = native.sh_decode(t, cut, len(data))
        if got is not None:
            try:
                want = _py(monkeypatch, SH.sh_decompress, t)
            except (IndexError, MemoryError, struct_error):
                continue
            assert got == want


struct_error = __import__("struct").error

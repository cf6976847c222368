"""HRT1 api backends + native runtime parity tests (CPU backend)."""

import numpy as np
import pytest

import fuzz_inputs
from hypersonic_rle_kit_tpu import api
from hypersonic_rle_kit_tpu.formats import rle8 as pyrle8
from hypersonic_rle_kit_tpu.ops import planar
from hypersonic_rle_kit_tpu.utils import native

CORPUS = fuzz_inputs.corpus(count=6)[:10]

needs_native = pytest.mark.skipif(native.lib() is None,
                                  reason="native runtime unavailable")


def test_api_backends_roundtrip():
    for data in CORPUS[:6]:
        c = api.compress(data, backend="auto")
        ch = api.compress(data, backend="host")
        assert c == ch, "native and host encoders disagree"
        for be in ("device", "host"):
            assert api.decompress(c, backend=be) == data


@needs_native
def test_native_rle8_parity():
    for data in CORPUS:
        assert native.rle8_compress(data) == pyrle8.rle8_compress(data)
        comp = pyrle8.rle8_compress(data)
        assert native.rle8_decompress(comp) == data


@needs_native
def test_native_decode_planar_threaded():
    """Threaded native block decoder: matches the input for every thread
    count, including the ragged last block (zero past block_len)."""
    import os

    rng = np.random.default_rng(11)
    data = fuzz_inputs.make_input(rng, n_sections=8)
    B = 4096
    nb = max(1, (len(data) + B - 1) // B)
    x = np.zeros((nb, B), np.uint8)
    flat = np.frombuffer(data, np.uint8)[: nb * B]
    x.reshape(-1)[: flat.size] = flat
    lens = np.full(nb, B, np.int32)
    lens[-1] = flat.size - (nb - 1) * B
    x.reshape(-1)[flat.size:] = 0
    cap = planar.capacity_for(B, 6)
    cols = native.planar_from_bytes(x, lens, cap)
    old = os.environ.get("HSRK_THREADS")
    try:
        for nt in ("1", "2", "4"):
            os.environ["HSRK_THREADS"] = nt
            out = native.decode_planar(cols[0], cols[1], cols[2], cols[3],
                                       cols[4], lens)
            np.testing.assert_array_equal(out, x)
    finally:
        if old is None:
            os.environ.pop("HSRK_THREADS", None)
        else:
            os.environ["HSRK_THREADS"] = old

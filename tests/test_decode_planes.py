"""Decode kernel v2 (delta-paint planes): golden model, native prep parity,
and the Pallas kernel in interpret mode, across symbol widths."""

import numpy as np
import pytest

import fuzz_inputs
from hypersonic_rle_kit_tpu.ops import decode_planes as dp, planar
from hypersonic_rle_kit_tpu.utils import native

needs_native = pytest.mark.skipif(native.lib() is None,
                                  reason="native runtime unavailable")


def _planar_corpus(block_size=1024, count=6):
    """Encode fuzz corpus entries into planar columns (width-1)."""
    cap = planar.capacity_for(block_size, 6)
    out = []
    for data in fuzz_inputs.corpus(count=count)[:count]:
        data = data[: 16 * block_size]
        arr = np.frombuffer(data, np.uint8)
        nb = max(1, -(-arr.size // block_size))
        x = np.zeros((nb, block_size), np.uint8)
        x.reshape(-1)[: arr.size] = arr
        cols = [planar.host_encode_block(x[b], cap, block_size, 6)
                for b in range(nb)]
        sym = np.stack([c[0] for c in cols])
        cnt = np.stack([c[1] for c in cols])
        ll = np.stack([c[2] for c in cols])
        lits = np.stack([c[3] for c in cols])
        ncm = np.array([c[4] for c in cols], np.int32)
        out.append((x, sym, cnt, ll, lits, ncm))
    return out


def test_planes_roundtrip_host_and_kernel():
    for x, sym, cnt, ll, lits, ncm in _planar_corpus():
        delta, lit = dp.planes_from_planar_np(sym, cnt, ll, lits, ncm)
        y = dp.decode_planes_host(delta, lit)
        np.testing.assert_array_equal(y, x)
        yk = np.asarray(dp.decode_planes_device(delta, lit, interpret=True,
                                                tile_rows=8))
        np.testing.assert_array_equal(yk, x)


@pytest.mark.parametrize("impl", ["bf16", "int8"])
def test_fused_roundtrip_host_and_kernel(impl):
    for x, sym, cnt, ll, lits, ncm in _planar_corpus():
        delta = dp.fused_delta_from_planar_np(sym, cnt, ll, lits, ncm)
        y = dp.decode_fused_host(delta)
        np.testing.assert_array_equal(y, x)
        yk = np.asarray(dp.decode_fused_device(delta, interpret=True,
                                               tile_rows=8, impl=impl))
        np.testing.assert_array_equal(yk, x)
        if native.lib() is not None:
            d_c = native.fused_delta_from_planar(sym, cnt, ll, lits, ncm)
            np.testing.assert_array_equal(d_c, delta)


@pytest.mark.parametrize("width", [2, 3, 5, 8, 16])
def test_fused_multiwidth(width):
    """Fused plane with w-byte pattern runs interleaved with literals."""
    rng = np.random.default_rng(100 + width)
    B, cap = 1536, 64
    sym = np.zeros((1, cap, width), np.uint8)
    count = np.zeros((1, cap), np.int32)
    lit_len = np.zeros((1, cap), np.int32)
    parts, lit_parts = [], []
    pos = c = 0
    while pos < B - 400 and c < cap - 1:
        ll = int(rng.integers(0, 50))
        litb = rng.integers(0, 256, ll, np.uint8)
        lit_parts.append(litb)
        parts.append(litb)
        pat = rng.integers(0, 256, width, np.uint8)
        ct = int(rng.integers(width * 2, 300))
        parts.append(np.tile(pat, ct // width + 1)[:ct])
        sym[0, c], count[0, c], lit_len[0, c] = pat, ct, ll
        pos += ll + ct
        c += 1
    tail = rng.integers(0, 256, 47, np.uint8)
    lit_parts.append(tail)
    parts.append(tail)
    lit_len[0, c] = tail.size
    c += 1
    exp = np.concatenate(parts)
    lits = np.zeros((1, B), np.uint8)
    alll = np.concatenate(lit_parts)
    lits[0, : alll.size] = alll
    ncm = np.array([c], np.int32)

    delta = dp.fused_delta_from_planar_np(sym, count, lit_len, lits, ncm,
                                          width=width)
    y = dp.decode_fused_host(delta, width=width)
    np.testing.assert_array_equal(y[0, : exp.size], exp)
    yk = np.asarray(dp.decode_fused_device(delta, width=width,
                                           interpret=True, tile_rows=4))
    np.testing.assert_array_equal(yk[0, : exp.size], exp)
    y8 = np.asarray(dp.decode_fused_device(delta, width=width,
                                           interpret=True, tile_rows=4,
                                           impl="int8"))
    np.testing.assert_array_equal(y8[0, : exp.size], exp)
    if native.lib() is not None:
        d_c = native.fused_delta_from_planar(sym, count, lit_len, lits, ncm,
                                             width=width)
        np.testing.assert_array_equal(d_c, delta)


@needs_native
def test_native_planes_match_golden():
    for x, sym, cnt, ll, lits, ncm in _planar_corpus():
        d_np, l_np = dp.planes_from_planar_np(sym, cnt, ll, lits, ncm)
        d_c, l_c = native.planes_from_planar(sym, cnt, ll, lits, ncm)
        np.testing.assert_array_equal(d_c, d_np)
        np.testing.assert_array_equal(l_c, l_np)


@pytest.mark.parametrize("width", [2, 3, 4, 6, 8, 16])
def test_multiwidth_planes(width):
    """Pattern runs of w-byte symbols (incl. unaligned byte tails) decode via
    the stride-w scan; native prep matches the golden prep."""
    rng = np.random.default_rng(width)
    B, cap = 1536, 64
    sym = np.zeros((1, cap, width), np.uint8)
    count = np.zeros((1, cap), np.int32)
    lit_len = np.zeros((1, cap), np.int32)
    parts, lit_parts = [], []
    pos = c = 0
    while pos < B - 400 and c < cap - 1:
        ll = int(rng.integers(0, 50))
        litb = rng.integers(0, 256, ll, np.uint8)
        lit_parts.append(litb)
        parts.append(litb)
        pat = rng.integers(0, 256, width, np.uint8)
        ct = int(rng.integers(width * 2, 300))          # byte-aligned count
        parts.append(np.tile(pat, ct // width + 1)[:ct])
        sym[0, c], count[0, c], lit_len[0, c] = pat, ct, ll
        pos += ll + ct
        c += 1
    tail = rng.integers(0, 256, 33, np.uint8)
    lit_parts.append(tail)
    parts.append(tail)
    lit_len[0, c] = tail.size
    c += 1
    exp = np.concatenate(parts)
    lits = np.zeros((1, B), np.uint8)
    alll = np.concatenate(lit_parts)
    lits[0, : alll.size] = alll
    ncm = np.array([c], np.int32)

    delta, lit = dp.planes_from_planar_np(sym, count, lit_len, lits, ncm,
                                          width=width)
    y = dp.decode_planes_host(delta, lit, width=width)
    np.testing.assert_array_equal(y[0, : exp.size], exp)
    yk = np.asarray(dp.decode_planes_device(delta, lit, width=width,
                                            interpret=True, tile_rows=4))
    np.testing.assert_array_equal(yk[0, : exp.size], exp)
    if native.lib() is not None:
        d_c, l_c = native.planes_from_planar(sym, count, lit_len, lits, ncm,
                                             width=width)
        np.testing.assert_array_equal(d_c, delta)
        np.testing.assert_array_equal(l_c, lit)

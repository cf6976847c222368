"""Compiled-kernel lane: the Mosaic-compiled decode/encode paths on a real
chip.  Interpret mode cannot catch Mosaic lowering or layout bugs, so this
lane runs the same roundtrips compiled.  Skipped unless the session backend
is TPU; on the bench box:

    HSRK_TPU_LANE=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":  # conftest pins CPU unless HSRK_TPU_LANE=1
    pytest.skip("needs the TPU backend (set HSRK_TPU_LANE=1 on the bench "
                "box)", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from hypersonic_rle_kit_tpu.ops import decode_sup, encode_sup, planar  # noqa: E402

B = 16384


def _dataset(nb, seed=0, p_zero=0.8):
    rng = np.random.default_rng(seed)
    d = rng.integers(-4, 5, (nb, B)).astype(np.int8).astype(np.uint8)
    d[rng.random(d.shape) < p_zero] = 0
    return d


def test_decode_compiled_roundtrip():
    data = _dataset(2)
    lens = np.array([B, B - 777], np.int32)
    data[1, lens[1]:] = 0
    cap = planar.capacity_for(B, 6)
    outs = [planar.host_encode_block(data[b, :lens[b]], cap, B, 6)
            for b in range(2)]
    cols = ([np.stack([o[i] for o in outs]) for i in range(4)]
            + [np.array([o[i] for o in outs], np.int32) for i in (4, 5)])
    out = np.asarray(decode_sup.decode_planar_sup(
        *cols, lens, block_size=B))
    want = data.copy()
    want[1, lens[1]:] = 0
    np.testing.assert_array_equal(out, want)


def test_encode_compiled_matches_golden():
    data = _dataset(2, seed=3)
    lens = np.full(2, B, np.int32)
    cap = planar.capacity_for(B, 6)
    got = [np.asarray(g) for g in encode_sup.encode_blocks_kernel(
        jnp.asarray(data), jnp.asarray(lens), capacity=cap, min_count=6)]
    for b in range(2):
        ref = planar.host_encode_block(data[b], cap, B, 6)
        for i in (0, 1, 2, 4, 5):
            np.testing.assert_array_equal(got[i][b], ref[i])
        nl = int(ref[5])
        np.testing.assert_array_equal(got[3][b][:nl], ref[3][:nl])


def test_profiler_trace_written(tmp_path):
    """One decode under jax.profiler leaves a device trace on disk (the
    observability analog of the reference's ns timers, main.c:1096-1121)."""
    data = _dataset(1, seed=5)
    lens = np.full(1, B, np.int32)
    cap = planar.capacity_for(B, 6)
    o = planar.host_encode_block(data[0], cap, B, 6)
    cols = [a[None] for a in o[:4]] + [np.array([o[4]], np.int32),
                                       np.array([o[5]], np.int32)]
    with jax.profiler.trace(str(tmp_path)):
        out = decode_sup.decode_planar_sup(*cols, lens, block_size=B)
        np.asarray(out)
    traces = list(tmp_path.rglob("*.xplane.pb"))
    assert traces, "no profiler trace written"


def test_deep_payload_compiled_roundtrip():
    """The full O(compressed) device pipeline compiled on-chip: deep
    container -> section pack -> on-device bit unpack + escape/dictionary
    resolution (Pallas resolver) -> decode kernel."""
    from hypersonic_rle_kit_tpu import api
    from hypersonic_rle_kit_tpu.parallel import container

    rng = np.random.default_rng(11)
    d = rng.integers(-4, 5, 300_000).astype(np.int8).astype(np.uint8)
    d[rng.random(300_000) < 0.8] = 0
    payload = d.tobytes()
    blob = api.compress(payload, "8 Bit")
    assert container.parse(blob)[0].deep
    assert api.decompress(blob, backend="kernel") == payload


def test_wide_codec_compiled_roundtrip():
    """Width transform on-device, compiled: 32-bit codec through the
    kernel backend."""
    from hypersonic_rle_kit_tpu import api

    rng = np.random.default_rng(12)
    px = rng.integers(0, 5, (40_000, 4), dtype=np.uint8)
    px[rng.random(40_000) < 0.7] = [9, 8, 7, 6]
    payload = px.reshape(-1).tobytes()[:159_995]
    blob = api.compress(payload, "32 Bit (Symbol)", backend="kernel")
    assert api.decompress(blob, backend="kernel") == payload

"""Tests for the end-to-end on-device decode (ops/decode_e2e.py): planar
columns (compressed-size) -> bytes entirely in XLA, checked against the host
golden decoder and the public container API."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hypersonic_rle_kit_tpu import api  # noqa: E402
from hypersonic_rle_kit_tpu.ops import decode_e2e, planar  # noqa: E402
from hypersonic_rle_kit_tpu.parallel import container  # noqa: E402

MC = 6


def _encode_host(x: np.ndarray, lens: np.ndarray, B: int):
    cap = planar.capacity_for(B, MC)
    outs = [planar.host_encode_block(x[b, :lens[b]], cap, B, MC)
            for b in range(x.shape[0])]
    sym = np.stack([o[0] for o in outs])
    count = np.stack([o[1] for o in outs])
    lit_len = np.stack([o[2] for o in outs])
    lits = np.stack([o[3] for o in outs])
    n_cmds = np.array([o[4] for o in outs], np.int32)
    return sym, count, lit_len, lits, n_cmds


def _roundtrip(x: np.ndarray, lens: np.ndarray, B: int) -> np.ndarray:
    sym, count, lit_len, lits, n_cmds = _encode_host(x, lens, B)
    y = decode_e2e.decode_planar_device(
        jnp.asarray(sym), jnp.asarray(count), jnp.asarray(lit_len),
        jnp.asarray(lits), jnp.asarray(n_cmds), jnp.asarray(lens),
        block_size=B, min_count=MC)
    return np.asarray(y)


def _check(x: np.ndarray, lens: np.ndarray, B: int):
    y = _roundtrip(x, lens, B)
    for b in range(x.shape[0]):
        n = int(lens[b])
        assert (y[b, :n] == x[b, :n]).all(), f"block {b} payload"
        assert (y[b, n:] == 0).all(), f"block {b} tail not zeroed"


@pytest.mark.parametrize("seed", range(4))
def test_random_dct_like(seed):
    B = 2048
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 5, (3, B), dtype=np.uint8)
    x[rng.random(x.shape) < 0.7] = 0
    lens = np.full(3, B, np.int32)
    _check(x, lens, B)


def test_all_literal():
    B = 1024
    rng = np.random.default_rng(9)
    x = np.arange(B, dtype=np.uint8)[None, :] + np.zeros((2, 1), np.uint8)
    x[1] = rng.integers(0, 256, B, dtype=np.uint8)
    # kill accidental runs
    x[1, 1::2] = (x[1, ::2] + 1) & 0xFF
    _check(x, np.full(2, B, np.int32), B)


def test_all_run_and_full_block_run():
    B = 2048
    x = np.zeros((3, B), np.uint8)
    x[0] = 7                                  # one run spanning the block
    x[1, :1024] = 3                           # run ending exactly on a tile
    x[1, 1024:] = np.arange(1024) % 256       # then literal-ish data
    x[1, 1025::2] = 255                       # kill runs in the tail half
    x[2, :5] = 1                              # below min_count: literals
    x[2, 5:11] = 2                            # exactly min_count run
    _check(x, np.full(3, B, np.int32), B)


def test_runs_crossing_tiles():
    B = 4096
    x = np.zeros((1, B), np.uint8)
    x[0, 100:3000] = 9                        # run crossing two tile bounds
    x[0, 3000:3100] = np.arange(100) % 7 + 1
    x[0, 3100:4096] = 5
    _check(x, np.full(1, B, np.int32), B)


def test_partial_tail_block():
    B = 2048
    rng = np.random.default_rng(3)
    x = np.zeros((2, B), np.uint8)
    x[0, :700] = rng.integers(0, 3, 700)
    lens = np.array([700, 1], np.int32)
    x[1, :1] = 42
    _check(x, lens, B)


def test_adjacent_runs_zero_lit_gap():
    B = 1024
    x = np.zeros((1, B), np.uint8)
    x[0, :100] = 1
    x[0, 100:200] = 2                         # adjacent runs, no literals
    x[0, 200:256] = 3
    _check(x, np.full(1, B, np.int32), B)


@pytest.mark.parametrize("n_bytes", [1 << 15, (1 << 15) - 777])
def test_container_end_to_end(n_bytes):
    rng = np.random.default_rng(n_bytes)
    data = rng.integers(0, 6, n_bytes, dtype=np.uint8)
    data[rng.random(n_bytes) < 0.65] = 0
    payload = data.tobytes()
    blob = api.compress(payload, block_size=4096)
    out, info = decode_e2e.decompress_container_device(blob)
    assert out == payload
    assert info.uncompressed_size == n_bytes


def test_matches_host_golden_on_fuzz_corpus():
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import fuzz_inputs
    B = 1024
    for data in fuzz_inputs.corpus(seed=0xE2E, count=6, n_sections=3):
        arr = np.frombuffer(data, np.uint8)
        nb = max(1, -(-arr.size // B))
        x = np.zeros((nb, B), np.uint8)
        x.reshape(-1)[:arr.size] = arr
        lens = np.full(nb, B, np.int32)
        lens[-1] = arr.size - (nb - 1) * B
        _check(x, lens, B)

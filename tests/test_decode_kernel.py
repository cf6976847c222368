"""Tests for the fused Pallas decode kernel (ops/decode_kernel.py) in
interpret mode on the CPU backend, against the host golden decoder."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hypersonic_rle_kit_tpu.ops import decode_kernel, planar  # noqa: E402

MC = 6


def _encode_host(x: np.ndarray, lens: np.ndarray, B: int):
    cap = planar.capacity_for(B, MC)
    outs = [planar.host_encode_block(x[b, :lens[b]], cap, B, MC)
            for b in range(x.shape[0])]
    return (np.stack([o[0] for o in outs]), np.stack([o[1] for o in outs]),
            np.stack([o[2] for o in outs]), np.stack([o[3] for o in outs]),
            np.array([o[4] for o in outs], np.int32))


def _check(x: np.ndarray, lens: np.ndarray, B: int):
    sym, count, lit_len, lits, n_cmds = _encode_host(x, lens, B)
    y = np.asarray(decode_kernel.decode_planar_kernel(
        sym, count, lit_len, lits, n_cmds, lens, block_size=B,
        interpret=True))
    for b in range(x.shape[0]):
        n = int(lens[b])
        assert (y[b, :n] == x[b, :n]).all(), f"block {b} payload"
        assert (y[b, n:] == 0).all(), f"block {b} tail"


@pytest.mark.parametrize("seed", range(3))
def test_random_dct_like(seed):
    B = 16384
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 5, (2, B), dtype=np.uint8)
    x[rng.random(x.shape) < 0.7] = 0
    _check(x, np.full(2, B, np.int32), B)


def test_small_blocks():
    B = 2048
    rng = np.random.default_rng(7)
    x = rng.integers(0, 4, (3, B), dtype=np.uint8)
    x[rng.random(x.shape) < 0.6] = 0
    _check(x, np.full(3, B, np.int32), B)


def test_all_literal_and_all_run():
    B = 16384
    rng = np.random.default_rng(9)
    x = np.zeros((3, B), np.uint8)
    x[0] = rng.integers(0, 256, B, dtype=np.uint8)
    x[0, 1::2] = (x[0, ::2] + 1) & 0xFF          # kill accidental runs
    x[1] = 7                                      # one full-block run
    x[2, :SUP() - 5] = 3                          # run ending near boundary
    x[2, SUP() - 5:] = rng.integers(0, 256, B - SUP() + 5, dtype=np.uint8)
    x[2, SUP() + 1::2] = (x[2, SUP()::2] + 1) & 0xFF
    _check(x, np.full(3, B, np.int32), B)


def SUP():
    return decode_kernel.SUP


def test_runs_crossing_supertiles():
    B = 49152                                    # 3 supertiles
    x = np.zeros((1, B), np.uint8)
    x[0, 100:20000] = 9                          # spans supertile 0->1
    x[0, 20000:20100] = np.arange(100) % 7 + 1
    x[0, 20100:49000] = 5                        # spans 1->2
    x[0, 49000:] = 255
    _check(x, np.full(1, B, np.int32), B)


def test_run_ending_exactly_on_boundary():
    B = 32768
    x = np.zeros((2, B), np.uint8)
    x[0, :decode_kernel.SUP] = 3                 # close exactly at boundary
    x[0, decode_kernel.SUP:] = 0                 # another run after
    x[1, 5:decode_kernel.SUP] = 200              # sym=200 close on boundary
    x[1, decode_kernel.SUP:] = 128               # sym=128 run (val==0 case)
    _check(x, np.full(2, B, np.int32), B)


def test_partial_tail_and_sym128():
    B = 16384
    x = np.zeros((2, B), np.uint8)
    x[0, :3000] = 128                            # sym-128 == 0 everywhere
    x[0, 3000:3600] = np.arange(600) % 251
    lens = np.array([3600, 1], np.int32)
    x[1, 0] = 9
    _check(x, lens, B)


def test_adjacent_runs_and_min_count_edges():
    B = 16384
    x = np.zeros((1, B), np.uint8)
    x[0, :100] = 1
    x[0, 100:200] = 2                            # adjacent runs
    x[0, 200:206] = 3                            # exactly min_count
    x[0, 206:210] = 4                            # below min_count: literals
    _check(x, np.full(1, B, np.int32), B)


def test_matches_fuzz_corpus():
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import fuzz_inputs
    B = 16384
    for data in fuzz_inputs.corpus(seed=0xDEC0, count=4, n_sections=3):
        arr = np.frombuffer(data, np.uint8)
        nb = max(1, -(-arr.size // B))
        x = np.zeros((nb, B), np.uint8)
        x.reshape(-1)[:arr.size] = arr
        lens = np.full(nb, B, np.int32)
        lens[-1] = arr.size - (nb - 1) * B
        _check(x, lens, B)

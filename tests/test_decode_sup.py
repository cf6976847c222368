"""Decode kernel v5 (sorted-event supertile decode) vs the host golden.

Interpret-mode on CPU; the compiled path is exercised by the TPU lane
(test_tpu_compiled.py) and bench.py on hardware.
"""

import numpy as np
import pytest

from hypersonic_rle_kit_tpu.ops import decode_sup, planar
from hypersonic_rle_kit_tpu.parallel import container

B = 4096


def _cols(blocks, lens, B, min_count=6):
    cap = planar.capacity_for(B, min_count)
    outs = [planar.host_encode_block(blocks[b][: lens[b]], cap, B, min_count)
            for b in range(len(blocks))]
    return ([np.stack([o[i] for o in outs]) for i in range(4)]
            + [np.array([o[i] for o in outs], np.int32) for i in (4, 5)])


def _roundtrip(blocks, lens, B, **kw):
    blocks = np.stack(blocks)
    lens = np.asarray(lens, np.int32)
    cols = _cols(blocks, lens, B)
    kw.setdefault("interpret", True)
    out = np.asarray(decode_sup.decode_planar_sup(
        *cols, lens, block_size=B, **kw))
    want = blocks.copy()
    for b in range(len(lens)):
        want[b, lens[b]:] = 0
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("p_zero", [0.0, 0.5, 0.85, 0.99])
def test_random_densities(p_zero):
    rng = np.random.default_rng(int(p_zero * 100))
    data = rng.integers(-4, 5, (3, B)).astype(np.int8).astype(np.uint8)
    data[rng.random(data.shape) < p_zero] = 0
    lens = np.array([B, B, B - 777])
    data[2, lens[2]:] = 0
    _roundtrip(list(data), lens, B)


def test_multi_supertile_block():
    rng = np.random.default_rng(0)
    BB = 16384
    data = rng.integers(0, 3, (2, BB)).astype(np.uint8)
    data[:, ::2] = 0
    _roundtrip(list(data), [BB, BB - 5], BB)


def test_small_block():
    rng = np.random.default_rng(1)
    BB = 2048
    data = rng.integers(0, 3, (2, BB)).astype(np.uint8)
    _roundtrip(list(data), [BB, BB], BB)


def test_unaligned_stripe_geometry_rejected():
    """block sizes whose R = B/128 is not a multiple of 8 mis-align the
    stripe paint window (ADVICE r4: silent corruption at B=16640); the
    kernel must refuse them and the api must route them to XLA."""
    BB = 16640                         # R = 130, not a multiple of 8
    assert not decode_sup.fits_kernel(BB, 128)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 3, (1, BB)).astype(np.uint8)
    with pytest.raises(AssertionError):
        _roundtrip(list(data), [BB], BB)

    from hypersonic_rle_kit_tpu import api
    raw = data.reshape(-1).tobytes()
    blob = api.compress(raw, block_size=BB)
    assert api.decompress(blob, backend="kernel") == raw


@pytest.mark.parametrize("case", [
    "whole_run", "run_ends_at_bnd", "run_starts_at_bnd", "adjacent_runs",
    "empty", "tiny", "dense_min_runs", "tail_run"])
def test_edges(case):
    BB = 8192
    d = np.zeros(BB, np.uint8)
    n = BB
    if case == "whole_run":
        d[:] = 7
    elif case == "run_ends_at_bnd":
        d[:4096] = 9
        d[4096:4100] = [1, 2, 3, 4]
    elif case == "run_starts_at_bnd":
        d[:] = np.arange(BB) & 0xFF
        d[4096:6000] = 5
    elif case == "adjacent_runs":
        d[:100] = 3
        d[100:200] = 4
    elif case == "empty":
        n = 0
    elif case == "tiny":
        d[:5] = [9, 8, 7, 6, 5]
        n = 5
    elif case == "dense_min_runs":
        d[:] = np.repeat(np.arange(BB // 6 + 1) % 251, 6)[:BB]
    elif case == "tail_run":
        n = BB - 1000
    _roundtrip([d], [n], BB)


def test_mid_stream_zero_count_commands():
    """count==0 commands mid-stream (possible in crafted containers) decode
    as pure-literal commands rather than corrupting the stream."""
    BB = 4096
    cap = 256
    sym = np.zeros((1, cap), np.uint8)
    count = np.zeros((1, cap), np.int32)
    lit_len = np.zeros((1, cap), np.int32)
    lits = np.zeros((1, BB), np.uint8)
    # cmd0: 4 lits + run of 10 'A'; cmd1: 3 lits, count 0; cmd2: tail lits
    lits[0, :12] = np.arange(1, 13)
    sym[0, 0] = 65
    count[0, 0] = 10
    lit_len[0, :3] = [4, 3, 5]
    n_cmds = np.array([3], np.int32)
    n_lits = np.array([12], np.int32)
    blen = np.array([22], np.int32)
    out = np.asarray(decode_sup.decode_planar_sup(
        sym, count, lit_len, lits, n_cmds, n_lits, blen,
        block_size=BB, interpret=True))
    want = np.zeros(BB, np.uint8)
    want[:4] = [1, 2, 3, 4]
    want[4:14] = 65
    want[14:17] = [5, 6, 7]
    want[17:22] = [8, 9, 10, 11, 12]
    np.testing.assert_array_equal(out[0], want)


def test_worst_density_and_ragged_tail():
    """Worst legal density (every 6 bytes a run) plus a ragged tail block
    decodes exactly — the dense stress the retired window buckets guarded."""
    rng = np.random.default_rng(7)
    BB = 16384
    data = np.repeat(rng.integers(0, 251, (3, BB // 6 + 1)), 6,
                     axis=1)[:, :BB].astype(np.uint8)
    lens = np.asarray([BB, BB - 3000, 17], np.int32)
    for b in range(3):
        data[b, lens[b]:] = 0
    _roundtrip(list(data), lens, BB)


def test_block_size_guard():
    with pytest.raises(AssertionError):
        decode_sup.decode_columns_device(
            np.zeros((1, 128), np.uint8), np.zeros((1, 128), np.int32),
            np.zeros((1, 128), np.int32),
            np.zeros((1, decode_sup.MAX_BLOCK * 2), np.uint8),
            np.ones(1, np.int32), np.zeros(1, np.int32),
            np.zeros(1, np.int32),
            block_size=decode_sup.MAX_BLOCK * 2, interpret=True)


def test_events_only_in_late_stripe():
    """A block whose only events sit past the first 128-row stripe: the
    stripe-of-column map must return stripe ids, not ranks among live
    stripes (regression: r4 bucketing painted stripe 0 instead)."""
    B = 65536
    sym = np.zeros((1, 128), np.uint8)
    count = np.zeros((1, 128), np.int32)
    lit_len = np.zeros((1, 128), np.int32)
    sym[0, 0] = 3
    count[0, 0] = 6
    lit_len[0, 0] = 30755
    lit_len[0, 1] = B - 6 - 30755
    n_lits = B - 6
    lits = np.zeros((1, B), np.uint8)
    lits[0, :n_lits] = (np.arange(n_lits) % 251).astype(np.uint8)
    y = np.asarray(decode_sup.decode_planar_sup(
        sym, count, lit_len, lits, np.array([2], np.int32),
        np.array([n_lits], np.int32), np.array([B], np.int32),
        block_size=B, interpret=True))
    h = planar.host_decode_block(sym[0], count[0], lit_len[0], lits[0], 2, B)
    assert np.array_equal(y[0], h)


def test_all_literal_fast_path():
    """Single-command (incompressible) blocks take the copy fast path and
    still decode exactly; mixed batches of fast and slow blocks agree with
    the host decoder."""
    B = 65536
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, B, dtype=np.uint8)      # all-literal block
    runs = np.zeros(B, np.uint8)
    runs[: B // 2] = 7                                  # run-heavy block
    blocks = np.stack([raw, runs])
    from hypersonic_rle_kit_tpu.ops import planar as pl_mod
    cap = pl_mod.capacity_for(B, 6)
    outs = [pl_mod.host_encode_block(blocks[b], cap, B, 6) for b in range(2)]
    cols = ([np.stack([o[i] for o in outs]) for i in range(4)]
            + [np.array([o[i] for o in outs], np.int32) for i in (4, 5)])
    assert cols[4][0] == 1          # the raw block really is one command
    y = np.asarray(decode_sup.decode_planar_sup(
        *cols, np.full(2, B, np.int32), block_size=B, interpret=True))
    np.testing.assert_array_equal(y, blocks)


def test_all_run_fast_path():
    """A block that is one whole-block run broadcasts its symbol (the
    MEMSET analog); partial-tail all-run blocks mask correctly."""
    B = 65536
    blocks = np.stack([np.full(B, 9, np.uint8), np.zeros(B, np.uint8)])
    lens = np.array([B, B - 321], np.int32)
    blocks[1, lens[1]:] = 0
    from hypersonic_rle_kit_tpu.ops import planar as pl_mod
    cap = pl_mod.capacity_for(B, 6)
    outs = [pl_mod.host_encode_block(blocks[b, :lens[b]], cap, B, 6)
            for b in range(2)]
    cols = ([np.stack([o[i] for o in outs]) for i in range(4)]
            + [np.array([o[i] for o in outs], np.int32) for i in (4, 5)])
    assert cols[4][0] == 2 and cols[1][0, 0] == B
    y = np.asarray(decode_sup.decode_planar_sup(
        *cols, lens, block_size=B, interpret=True))
    np.testing.assert_array_equal(y, blocks)


def test_capacity_cliff_over_budget_routes_to_xla():
    """Blocks denser than the event-column budget must leave the compiled
    path (fits_kernel False) and still decode exactly via the XLA
    decoder; just-under-budget blocks stay kernel-eligible (VERDICT r4
    weak #4: the boundary was untested near the cliff)."""
    from hypersonic_rle_kit_tpu import api
    BB = 1 << 18
    ns = -(-BB // decode_sup.STRIPE_BYTES)
    budget_cols = decode_sup.MAX_COLUMNS - ns * decode_sup._QUAD
    cap_limit = budget_cols * 64            # ceil(2*cap/128) columns
    assert decode_sup.fits_kernel(BB, cap_limit)
    assert not decode_sup.fits_kernel(BB, cap_limit + 128)

    # runs of 6 zeros split by one literal: ~BB/7 commands, over budget
    unit = np.concatenate([np.zeros(6, np.uint8),
                           np.array([7], np.uint8)])
    dense = np.tile(unit, BB // 7 + 1)[:BB]
    raw = dense.tobytes()
    blob = api.compress(raw, block_size=BB)
    info, blocks = container.deserialize_to_planar(blob)
    n_cmds = int(blocks[4].max())
    assert not decode_sup.fits_kernel(BB, -(-n_cmds // 128) * 128)
    assert api.decompress(blob, backend="kernel") == raw

    # runs of 12 split by one literal: under budget, kernel-eligible
    unit2 = np.concatenate([np.zeros(12, np.uint8),
                            np.array([7], np.uint8)])
    sparse = np.tile(unit2, BB // 13 + 1)[:BB]
    raw2 = sparse.tobytes()
    blob2 = api.compress(raw2, block_size=BB)
    info2, blocks2 = container.deserialize_to_planar(blob2)
    n_cmds2 = int(blocks2[4].max())
    assert decode_sup.fits_kernel(BB, -(-n_cmds2 // 128) * 128)
    assert api.decompress(blob2, backend="kernel") == raw2


@pytest.mark.parametrize("w", [4, 8, 16])
@pytest.mark.parametrize("seed", [0, 3])
def test_interleave_words(w, seed):
    """Word-domain width re-interleave == the numpy byte transpose."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    nb, B = 2, 4 * w * 32
    orig = rng.integers(0, 256, (nb, B)).astype(np.uint8)
    plane = orig.reshape(nb, B // w, w).transpose(0, 2, 1).reshape(nb, B)
    yw = np.ascontiguousarray(plane).view(np.int32)
    out = np.asarray(decode_sup.interleave_words(jnp.asarray(yw), w=w))
    got = np.ascontiguousarray(out).view(np.uint8).reshape(nb, B)
    assert (got == orig).all()

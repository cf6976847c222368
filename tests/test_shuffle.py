"""Randomized tests for the scan/roll vector primitives (ops/shuffle.py) —
the gather/scatter-free data-movement layer the device codec paths build on."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hypersonic_rle_kit_tpu.ops import shuffle  # noqa: E402


def _tile(rng, rows, dtype=np.int32, hi=1000):
    return rng.integers(0, hi, (rows, 128)).astype(dtype)


@pytest.mark.parametrize("rows", [1, 2, 8])
@pytest.mark.parametrize("s", [0, 1, 5, 127, 128, 129, 300, 1023])
def test_flat_roll(rows, s):
    if s >= rows * 128:
        s %= rows * 128
    rng = np.random.default_rng(s + rows)
    x = _tile(rng, rows)
    got = np.asarray(shuffle.flat_roll(jnp.asarray(x), s))
    want = np.roll(x.reshape(-1), s).reshape(rows, 128)
    assert (got == want).all()


def test_flat_roll_batched():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 99, (3, 4, 2, 128), dtype=np.int32)
    got = np.asarray(shuffle.flat_roll(jnp.asarray(x), 130))
    for i in range(3):
        for j in range(4):
            want = np.roll(x[i, j].reshape(-1), 130).reshape(2, 128)
            assert (got[i, j] == want).all()


@pytest.mark.parametrize("rows", [1, 2, 8, 16])
def test_cumsum_tile(rows):
    rng = np.random.default_rng(rows)
    x = rng.integers(0, 7, (rows, 128)).astype(np.int32)
    inc = np.asarray(shuffle.inclusive_cumsum_tile(jnp.asarray(x)))
    exc = np.asarray(shuffle.exclusive_cumsum_tile(jnp.asarray(x)))
    flat = np.cumsum(x.reshape(-1))
    assert (inc.reshape(-1) == flat).all()
    assert (exc.reshape(-1) == flat - x.reshape(-1)).all()


def test_cumsum_tile_batched():
    rng = np.random.default_rng(6)
    x = rng.integers(0, 7, (5, 4, 128)).astype(np.int32)
    got = np.asarray(shuffle.inclusive_cumsum_tile(jnp.asarray(x)))
    for b in range(5):
        assert (got[b].reshape(-1) == np.cumsum(x[b].reshape(-1))).all()


@pytest.mark.parametrize("rows", [1, 8])
@pytest.mark.parametrize("density", [0.0, 0.01, 0.3, 0.9, 1.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_fill(rows, density, seed):
    n = rows * 128
    rng = np.random.default_rng(seed * 100 + rows)
    valid = rng.random(n) < density
    x = rng.integers(0, 10 ** 6, n).astype(np.int32)
    got, gotv = shuffle.forward_fill_tile(
        jnp.asarray(x.reshape(rows, 128)),
        jnp.asarray(valid.reshape(rows, 128)))
    got = np.asarray(got).reshape(-1)
    gotv = np.asarray(gotv).reshape(-1)
    want = x.copy()
    want_v = np.zeros(n, bool)
    last = None
    for p in range(n):
        if valid[p]:
            last = x[p]
        if last is not None:
            want[p] = last
            want_v[p] = True
    assert (gotv == want_v).all()
    assert (got[want_v] == want[want_v]).all()


@pytest.mark.parametrize("rows", [1, 8])
@pytest.mark.parametrize("density", [0.02, 0.3, 0.97])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_staircase_pull(rows, density, seed):
    n = rows * 128
    rng = np.random.default_rng(seed * 31 + rows)
    steps = (rng.random(n - 1) < density).astype(np.int32)
    src = np.concatenate(([0], np.cumsum(steps)))
    x = rng.integers(0, 255, n).astype(np.int32)
    d = (np.arange(n) - src).astype(np.int32)
    got = np.asarray(shuffle.staircase_pull(
        jnp.asarray(x.reshape(rows, 128)),
        jnp.asarray(d.reshape(rows, 128)))).reshape(-1)
    assert (got == x[src]).all()


def test_forward_fill_batched():
    rng = np.random.default_rng(9)
    x = rng.integers(0, 99, (4, 2, 128)).astype(np.int32)
    valid = rng.random((4, 2, 128)) < 0.2
    valid[:, 0, 0] = True
    got, gotv = shuffle.forward_fill_tile(jnp.asarray(x), jnp.asarray(valid))
    got = np.asarray(got)
    assert np.asarray(gotv).all()
    for b in range(4):
        xf = x[b].reshape(-1)
        vf = valid[b].reshape(-1)
        last = xf[0]
        for p in range(256):
            if vf[p]:
                last = xf[p]
            assert got[b].reshape(-1)[p] == last


def test_cummax_spike_rows():
    """Regression: row-carry of the max-scan must cover every earlier row
    (a shift-pattern bug once missed even row distances)."""
    import numpy as np
    import jax.numpy as jnp
    from hypersonic_rle_kit_tpu.ops import shuffle
    rng = np.random.default_rng(42)
    for R in (4, 16, 32):
        for _ in range(4):
            x = np.full((R, 128), -1, np.int32)
            x[rng.integers(R), rng.integers(128)] = 999
            got = np.asarray(shuffle.inclusive_cummax_tile(jnp.asarray(x)))
            np.testing.assert_array_equal(
                got.reshape(-1), np.maximum.accumulate(x.reshape(-1)))


@pytest.mark.parametrize("rows", [1, 4, 16])
@pytest.mark.parametrize("density", [0.0, 0.1, 0.5, 0.9, 1.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flat_compact(rows, density, seed):
    rng = np.random.default_rng(seed * 131 + rows)
    a = _tile(rng, rows)
    b = _tile(rng, rows)
    keep = rng.random((rows, 128)) < density
    (ga, gb), _ = shuffle.flat_compact(
        [jnp.asarray(a), jnp.asarray(b)], jnp.asarray(keep))
    n = int(keep.sum())
    ka = a.reshape(-1)[keep.reshape(-1)]
    kb = b.reshape(-1)[keep.reshape(-1)]
    assert (np.asarray(ga).reshape(-1)[:n] == ka).all()
    assert (np.asarray(gb).reshape(-1)[:n] == kb).all()


@pytest.mark.parametrize("seed", range(4))
def test_flat_compact_batched(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 20, (3, 8, 128)).astype(np.int32)
    keep = rng.random((3, 8, 128)) < 0.3
    (ga,), _ = shuffle.flat_compact([jnp.asarray(a)], jnp.asarray(keep))
    ga = np.asarray(ga)
    for g in range(3):
        n = int(keep[g].sum())
        want = a[g].reshape(-1)[keep[g].reshape(-1)]
        assert (ga[g].reshape(-1)[:n] == want).all()


@pytest.mark.parametrize("density", [0.0, 0.15, 0.25, 0.6, 1.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_row_compact(density, seed):
    rng = np.random.default_rng(seed * 17 + 3)
    a = _tile(rng, 8)
    b = _tile(rng, 8)
    keep = rng.random((8, 128)) < density
    (ga, gb), cnt = shuffle.row_compact(
        [jnp.asarray(a), jnp.asarray(b)], jnp.asarray(keep))
    ga, gb, cnt = np.asarray(ga), np.asarray(gb), np.asarray(cnt)
    for r in range(8):
        n = int(keep[r].sum())
        assert cnt[r, 0] == n
        assert (ga[r, :n] == a[r][keep[r]]).all()
        assert (gb[r, :n] == b[r][keep[r]]).all()

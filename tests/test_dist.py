"""Multi-device tests for the sharded block codec (parallel/dist.py).

Runs on the virtual 8-device CPU mesh from conftest.py — the in-repo analog
of the driver's multichip dryrun.  Covers: the sharded
compress->size-exchange->decompress pipeline, the ordered all-gather
reassembly, and byte equality of the distributed serialization with the
single-device container bytes (the multi-chip generalization of the rle8m
offset-table container, rle8_low_entropy_cpu.c:126-250).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hypersonic_rle_kit_tpu import api  # noqa: E402
from hypersonic_rle_kit_tpu.ops import planar  # noqa: E402
from hypersonic_rle_kit_tpu.parallel import container, dist  # noqa: E402

B = 1024
MIN_COUNT = 6


def _data(nb: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 5, (nb, B), dtype=np.uint8)
    x[:, ::3] = 0
    x[:, 100:200] = 9
    return x


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")
    return dist.make_mesh()


def test_pipeline_step_roundtrip(mesh):
    n_dev = mesh.devices.size
    nb = 2 * n_dev
    x = _data(nb)
    lens = np.full(nb, B, np.int32)
    cap = planar.capacity_for(B, MIN_COUNT)
    y, offsets, sizes = dist.pipeline_step(
        jnp.asarray(x), jnp.asarray(lens), capacity=cap,
        min_count=MIN_COUNT, mesh=mesh)
    assert (np.asarray(y) == x).all()
    sizes = np.asarray(sizes)
    offsets = np.asarray(offsets)
    assert (offsets == np.cumsum(sizes) - sizes).all()


def test_encode_sharded_matches_local_encode(mesh):
    """The all-gathered columns must equal a plain single-device encode."""
    from hypersonic_rle_kit_tpu.ops import device as dev_ops

    n_dev = mesh.devices.size
    nb = 3 * n_dev
    x = _data(nb, seed=11)
    lens = np.full(nb, B, np.int32)
    cap = planar.capacity_for(B, MIN_COUNT)
    pb, sizes, offsets = dist.encode_sharded(
        jnp.asarray(x), jnp.asarray(lens), capacity=cap,
        min_count=MIN_COUNT, mesh=mesh)
    ref = dev_ops.encode_blocks(jnp.asarray(x), jnp.asarray(lens),
                                capacity=cap, min_count=MIN_COUNT)
    for name in ("sym", "count", "lit_len", "lits", "n_cmds", "n_lits"):
        assert (np.asarray(getattr(pb, name))
                == np.asarray(getattr(ref, name))).all(), name
    assert (np.asarray(offsets) ==
            np.cumsum(np.asarray(sizes)) - np.asarray(sizes)).all()


def test_device_size_model_matches_serializer(mesh):
    """Per-block sizes computed on-device (bit-width model) must equal the
    actual serialized payload bytes the container emits."""
    n_dev = mesh.devices.size
    nb = 2 * n_dev
    x = _data(nb, seed=13)
    lens = np.full(nb, B, np.int32)
    cap = planar.capacity_for(B, MIN_COUNT)
    pb, sizes, _ = dist.encode_sharded(
        jnp.asarray(x), jnp.asarray(lens), capacity=cap,
        min_count=MIN_COUNT, mesh=mesh)
    cols = [np.asarray(v) for v in (pb.sym, pb.count, pb.lit_len, pb.lits,
                                    pb.n_cmds, pb.n_lits)]
    # the in-mesh size model prices the flat per-block layout (an upper
    # bound on shipping); deep/litdict re-packing may beat it
    blob = container.serialize_blocks(0, nb * B, B, MIN_COUNT, *cols,
                                      deep=False)
    _, blocks = container.parse(blob)
    actual = np.array([bl["payload_bytes"] for bl in blocks])
    assert (np.asarray(sizes) == actual).all(), (np.asarray(sizes), actual)


@pytest.mark.parametrize("n_bytes", [B * 16, B * 16 - 333, B * 5 + 1])
def test_compress_distributed_byte_equal(mesh, n_bytes):
    """Distributed container bytes == single-device api.compress bytes."""
    rng = np.random.default_rng(n_bytes)
    data = rng.integers(0, 4, n_bytes, dtype=np.uint8)
    data[rng.random(n_bytes) < 0.6] = 0
    payload = data.tobytes()
    blob_dist = dist.compress_distributed(payload, mesh, block_size=B,
                                          min_count=MIN_COUNT)
    blob_one = api.compress(payload, block_size=B, backend="device")
    assert blob_dist == blob_one
    assert api.decompress(blob_dist, backend="device") == payload


def test_compress_distributed_roundtrip_host(mesh):
    data = _data(16, seed=17).reshape(-1).tobytes()
    blob = dist.compress_distributed(data, mesh, block_size=B)
    assert api.decompress(blob, backend="host") == data


def test_sizes_only_exchange_bytes_on_wire():
    """Scaling claims rest on communication accounting, not this box's
    wall clock: the sharded pipeline's collectives must carry O(n_blocks)
    size metadata, never O(stream) column data (VERDICT r3 #9).  Asserted
    on the compiled HLO: every all-gather/all-reduce operand is a few
    bytes per block."""
    import re

    import jax.numpy as jnp

    from hypersonic_rle_kit_tpu.ops import planar
    from hypersonic_rle_kit_tpu.parallel import dist

    mesh = dist.make_mesh(min(4, len(jax.devices())))
    nb, B = 8, 1024
    cap = planar.capacity_for(B, 6)
    x = jnp.zeros((nb, B), jnp.uint8)
    ls = jnp.full(nb, B, jnp.int32)
    lowered = dist.pipeline_step.lower(
        x, ls, capacity=cap, min_count=6, mesh=mesh)
    hlo = lowered.as_text()          # StableHLO: collectives still named
    wire = 0
    for m in re.finditer(
            r'"stablehlo\.all_(?:gather|reduce)"[^:]*:[^)]*\)\s*->\s*'
            r'tensor<([0-9x]*)x?([a-z0-9]+)>', hlo):
        dims, dt = m.group(1), m.group(2)
        elems = 1
        for d in filter(None, dims.split("x")):
            elems *= int(d)
        size = {"i32": 4, "ui32": 4, "i64": 8, "f32": 4,
                "i8": 1, "ui8": 1, "i1": 1}.get(dt, 4)
        wire += elems * size
    # sizes + offsets per block, replicated: within 16 bytes/block
    assert wire <= 16 * nb, f"collectives move {wire} bytes for {nb} blocks"
    assert wire > 0, "expected at least the size all-gather on the wire"

"""Multi-chip / multi-host distribution of the block codec.

The reference has no inter-process communication at all (SURVEY.md section
2.4); its only parallel-decode notion is the `rle8m` subsection container
decoded by one OpenCL work-group per subsection (rle8_ocl.c:265-413).  The
TPU design scales the same shape out over a `jax.sharding.Mesh`:

- the uncompressed stream is split into fixed-size blocks; the block axis is
  sharded over the mesh ("block data parallelism", the long-stream analog of
  sequence parallelism);
- each device encodes/decodes its blocks independently (`shard_map`);
- per-block compressed sizes are exchanged with `all_gather` along the mesh
  axis, and an exclusive prefix sum over them yields every block's byte
  offset in the final container — the parallel analog of the reference's
  serial `index +=` bookkeeping and of the rle8m u32 offset table.

Everything here also runs on a CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import device as dev_ops
from ..ops.planar import PlanarBlocks

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, axis: str = BLOCK_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _encode_local(x, block_len, *, capacity: int, min_count: int):
    pb = dev_ops.encode_blocks(x, block_len, capacity=capacity,
                               min_count=min_count)
    # serialized payload size of each block (bytes, bit-packed columns):
    # n_runs syms + bitpacked counts/lit_lens + literals (container.py layout)
    n_runs = pb.n_cmds - 1
    cnt_w = 32 - jax.lax.clz(jnp.maximum(
        jnp.max(pb.count, axis=1) - min_count, 0).astype(jnp.int32))
    lit_w = 32 - jax.lax.clz(jnp.max(pb.lit_len, axis=1).astype(jnp.int32))
    size = ((cnt_w * n_runs + 7) // 8 + (lit_w * pb.n_cmds + 7) // 8
            + n_runs + pb.n_lits)
    return pb, size


@functools.partial(jax.jit, static_argnames=("capacity", "min_count", "mesh"))
def pipeline_step(x, block_len, *, capacity: int, min_count: int, mesh: Mesh):
    """One full sharded compress->size-exchange->decompress step.

    ``x: [nb, B] uint8`` sharded over blocks; returns (decoded blocks, global
    per-block byte offsets, per-block compressed sizes).  This is the
    "training step" analog used by the multi-chip dry run.
    """

    def local(xs, ls):
        pb, size = _encode_local(xs, ls, capacity=capacity, min_count=min_count)
        # exchange sizes: every device learns all block sizes (ICI all-gather)
        all_sizes = jax.lax.all_gather(size, BLOCK_AXIS, tiled=True)
        offsets = jnp.cumsum(all_sizes) - all_sizes   # exclusive prefix sum
        y = dev_ops.decode_blocks(pb)
        # my shard of the global offset table
        idx = jax.lax.axis_index(BLOCK_AXIS)
        nb_local = xs.shape[0]
        my_off = jax.lax.dynamic_slice_in_dim(offsets, idx * nb_local, nb_local)
        return y, my_off, size

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
    )(x, block_len)


def initialize_multihost(coordinator: str | None = None) -> None:
    """Multi-host runtime init (`jax.distributed.initialize`); DCN only
    carries the size exchange and the final ordered concatenation."""
    if jax.process_count() > 1 or coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)

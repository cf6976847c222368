"""User-facing compress / decompress.

Mirrors the reference's public surface (rle.h:53-468) with two interchangeable
on-disk formats:

- **reference formats** (`formats/*`): byte-exact interop with the C library,
  host-side.
- **HRT1 container** (`parallel/container.py`): the TPU-native block format;
  encode and decode run on the accelerator via `ops/device.py`.

Sizes use Python ints (the reference caps at u32/1 GiB per stream; HRT1
streams are u64 and sharded by blocks).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import spec as spec_mod
from .ops import device, planar
from .parallel import container

# per-family minimum run length for the HRT1 cost model: one command must not
# cost more than it saves.  8-bit commands cost ~3 bytes in the reference
# grammar (min_count 6, rle8_extreme_cpu.h:5); HRT1 commands cost
# cnt_bits+lit_bits+8 bits ~= 3 bytes, so the same threshold is used.
_DEFAULT_MIN_COUNT = 6


def _as_bytes_array(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data.reshape(-1).view(np.uint8))
    return np.frombuffer(memoryview(data), dtype=np.uint8)


def _to_blocks(arr: np.ndarray, block_size: int) -> tuple[np.ndarray, np.ndarray]:
    n = arr.size
    nb = max(1, -(-n // block_size))
    padded = np.zeros(nb * block_size, np.uint8)
    padded[:n] = arr
    lens = np.full(nb, block_size, np.int32)
    tail = n - (nb - 1) * block_size
    lens[-1] = tail
    return padded.reshape(nb, block_size), lens


def compress_bounds(in_size: int, block_size: int = container.DEFAULT_BLOCK_SIZE) -> int:
    """Worst-case HRT1 size: header + table + per-block worst payload."""
    nb = max(1, -(-in_size // block_size))
    per_block = block_size + block_size // _DEFAULT_MIN_COUNT * 8 + 64
    return 24 + nb * (16 + per_block)


def compress(data, codec: str | int | spec_mod.CodecSpec = "8 Bit", *,
             block_size: int = container.DEFAULT_BLOCK_SIZE,
             backend: str = "auto") -> bytes:
    """Compress to the HRT1 container.

    ``backend``: 'kernel' (Pallas block encoder, the flagship device path),
    'device' (jit XLA encode), 'native' (C++ host encoder), 'host' (numpy
    golden path) or 'auto' (native if available; else the Pallas kernel on
    TPU backends, else XLA).  All encoders emit identical commands.
    """
    cspec = _resolve(codec)
    arr = _as_bytes_array(data)
    if arr.size == 0:
        return container.serialize_blocks(
            cspec.index, 0, block_size, _DEFAULT_MIN_COUNT,
            np.zeros((0, 1), np.uint8), np.zeros((0, 1), np.int32),
            np.zeros((0, 1), np.int32), np.zeros((0, block_size), np.uint8),
            np.zeros(0, np.int32), np.zeros(0, np.int32))
    min_count = _DEFAULT_MIN_COUNT
    x, lens = _to_blocks(arr, block_size)
    cap = planar.capacity_for(block_size, min_count)
    cols = None
    if backend in ("auto", "native"):
        from .utils import native
        cols = native.planar_from_bytes(x, lens, cap, min_count)
        if cols is None and backend == "native":
            raise RuntimeError("native runtime unavailable")
    if cols is None and (backend == "kernel" or (
            backend == "auto" and jax.default_backend() == "tpu")):
        from .ops import encode_sup
        interp = jax.default_backend() != "tpu"
        cols = [np.asarray(v) for v in encode_sup.encode_blocks_kernel(
            jnp.asarray(x), jnp.asarray(lens), capacity=cap,
            min_count=min_count, interpret=interp)]
    if cols is None and backend in ("auto", "device"):
        pb = device.encode_blocks(x, lens, capacity=cap, min_count=min_count)
        cols = [np.asarray(v) for v in
                (pb.sym, pb.count, pb.lit_len, pb.lits, pb.n_cmds, pb.n_lits)]
    if cols is None:
        cols = _host_encode(x, lens, cap, block_size, min_count)
    return container.serialize_blocks(
        cspec.index, arr.size, block_size, min_count, *cols)


def _sup_for(block_size: int) -> int | None:
    """Largest supported supertile size dividing ``block_size``."""
    from .ops import decode_sup
    if block_size > decode_sup.MAX_BLOCK:
        return None
    for s in (4096, 2048, 1024, 512, 256, 128):
        if block_size % s == 0:
            return s
    return None


def decompress(buf, *, backend: str = "auto") -> bytes:
    """Decompress an HRT1 container.

    ``backend``: 'kernel' (fused Pallas event decode -- the flagship device
    path, O(compressed) input), 'device' (XLA), 'host' (numpy), 'auto'
    (kernel on TPU backends, else XLA).
    """
    info, planar_cols = container.deserialize_to_planar(bytes(buf))
    sym, count, lit_len, lits, n_cmds, n_lits, block_len = planar_cols
    if info.uncompressed_size == 0:
        return b""
    if backend == "auto":
        backend = "kernel" if jax.default_backend() == "tpu" else "device"
    if backend == "kernel":
        from .ops import decode_sup
        sup = _sup_for(info.block_size)
        y = None
        if sup is not None:
            try:
                y = np.asarray(decode_sup.decode_planar_sup(
                    sym, count, lit_len, lits, n_cmds, n_lits, block_len,
                    block_size=info.block_size, sup=sup))
            except ValueError:        # denser than any window bucket
                y = None
        backend = "done" if y is not None else "device"  # XLA fallback
    if backend == "done":
        pass
    elif backend == "device":
        pb = planar.PlanarBlocks(
            jnp.asarray(sym), jnp.asarray(count), jnp.asarray(lit_len),
            jnp.asarray(lits), jnp.asarray(n_cmds), jnp.asarray(n_lits),
            jnp.asarray(block_len))
        y = np.asarray(device.decode_blocks(pb))
    elif backend == "host":
        y = np.stack([
            np.pad(planar.host_decode_block(
                sym[b], count[b], lit_len[b], lits[b],
                int(n_cmds[b]), int(block_len[b])),
                (0, info.block_size - int(block_len[b])))
            for b in range(info.n_blocks)])
    else:
        raise ValueError(f"unknown backend {backend!r}")
    mask = np.arange(info.block_size)[None, :] < block_len[:, None]
    return y[mask].tobytes()


def _host_encode(x, lens, cap, block_size, min_count):
    outs = [planar.host_encode_block(x[b, :lens[b]], cap, block_size, min_count)
            for b in range(x.shape[0])]
    sym = np.stack([o[0] for o in outs])
    count = np.stack([o[1] for o in outs])
    lit_len = np.stack([o[2] for o in outs])
    lits = np.stack([o[3] for o in outs])
    n_cmds = np.array([o[4] for o in outs], np.int32)
    n_lits = np.array([o[5] for o in outs], np.int32)
    return [sym, count, lit_len, lits, n_cmds, n_lits]


def _resolve(codec) -> spec_mod.CodecSpec:
    if isinstance(codec, spec_mod.CodecSpec):
        return codec
    if isinstance(codec, int):
        return spec_mod.by_index(codec)
    return spec_mod.by_name(codec)

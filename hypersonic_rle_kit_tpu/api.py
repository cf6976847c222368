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

import functools

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

# kernel -> XLA capacity-fallback counter: observable so the fuzz lane can
# assert the Pallas path actually ran (fuzz.py --device-backend kernel);
# the reference analog is --max-simd's explicit tier forcing (main.c:172-282)
_kernel_fallbacks = 0

_RESOURCE_MARKERS = ("RESOURCE_EXHAUSTED", "resource_exhausted", "vmem",
                     "VMEM", "out of memory", "scoped", "exceeds",
                     "Attempting to allocate")


def kernel_fallback_count() -> int:
    """Number of kernel->XLA capacity fallbacks taken by decompress()."""
    return _kernel_fallbacks


def _is_resource_error(exc: Exception) -> bool:
    """Whether an exception is a genuine device-capacity limit (VMEM /
    allocation) rather than a kernel bug; only these may demote the
    flagship kernel to the XLA decoder."""
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in _RESOURCE_MARKERS)


def hrt1_params(cspec: "spec_mod.CodecSpec"):
    """Map a reference codec spec onto the HRT1 device pipeline's parameter
    space: ``(width_bytes, default_block_size, min_count, single)``.

    TPU-native re-design of the reference's macro matrix (SURVEY.md §1):
    instead of five macro-instantiated SIMD codec copies per width
    (rleX_extreme_cpu.c:4-64), *one* engine runs behind a per-codec
    transform:

    - **width** (16/24/32/48/64/128 bit, rleX/rle24/rle48/rle128): blocks
      are de-interleaved into ``w`` byte lanes, so a run of w-byte symbols
      becomes w contiguous byte runs and the stride-1 kernels apply
      unchanged (the TPU analog of the reference's staggered broadcast
      registers, rle24_extreme_cpu_decode.h:30-55).  Byte-aligned
      ("(Byte)"/UNBOUND) and symbol-aligned variants both map here: the
      per-lane view captures partial-symbol repetition a fortiori.
    - **short / packed / greedy** change the command cost model: Short's
      one-byte commands (rleX_Xsl_short.h:13-42) lower the profitable run
      length, Packed's same-symbol elision (rle8_extreme_cpu.h:832-853)
      sits between; HRT1 expresses this as the emission threshold
      ``min_count`` because its bit-packed columns already adapt command
      width per block.
    - **single** (rle8_extreme_cpu.c:53-153): emission restricted to the
      block's dominant byte; the symbol column then collapses.

    Low-entropy / MMTF / SH families keep their own device paths
    (ops/low_entropy_device.py, ops/mmtf_device.py); through HRT1 they
    fall back to the base byte-lane engine.
    """
    F = spec_mod.Family
    w = max(1, cspec.width // 8) if cspec.family in (
        F.RLE8, F.RLEX, F.LUT, F.SHORT) else 1
    if cspec.family is F.MEMCPY:
        w = 1
    block = 196608 if w in (3, 6) else container.DEFAULT_BLOCK_SIZE
    F2 = spec_mod.Family
    if cspec.short or cspec.greedy or cspec.family is F2.LUT:
        # deep-layout commands cost ~2 bytes (6b count + 6b lit_len + 3b
        # symbol ref), the Short/LUT cost model (rleX_Xsl_short.h:13-42)
        min_count = 4
    elif cspec.packed:
        min_count = 5
    else:
        min_count = _DEFAULT_MIN_COUNT
    return w, block, min_count, bool(cspec.single)


def _deinterleave_block(row: np.ndarray, n: int, w: int) -> tuple[np.ndarray, int]:
    """One padded block row -> byte-lane layout prefix of length
    ceil(n/w)*w (rest zero), with the transformed valid length."""
    B = row.shape[0]
    bt = -(-n // w) * w
    out = np.zeros(B, np.uint8)
    out[:bt] = row[:bt].reshape(bt // w, w).T.reshape(-1)
    return out, bt


def _interleave_block(row: np.ndarray, n: int, w: int) -> np.ndarray:
    """Inverse of :func:`_deinterleave_block`, trimmed to ``n`` bytes."""
    bt = -(-n // w) * w
    return row[:bt].reshape(w, bt // w).T.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("nb", "w", "B"))
def _interleave_plane(a, *, nb: int, w: int, B: int):
    """On-device byte-plane re-interleave for the 16/24/48-bit widths
    (w % 4 != 0; the word-domain form needs whole words per lane).
    Cached by geometry -- the r4 path rebuilt a fresh jit per call."""
    return a.reshape(nb, w, B // w).swapaxes(1, 2).reshape(nb, B)


def _deinterleave(x: np.ndarray, lens: np.ndarray, w: int):
    """[nb, B] blocks + original lengths -> transformed blocks + lengths."""
    if w == 1:
        return x, lens
    nb, B = x.shape
    xt = x.reshape(nb, B // w, w).swapaxes(1, 2).reshape(nb, B)
    tlens = (-(-lens.astype(np.int64) // w) * w).astype(np.int32)
    for b in np.flatnonzero(lens != B):           # partial (tail) blocks
        xt[b], tlens[b] = _deinterleave_block(x[b], int(lens[b]), w)
    return xt, tlens


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
             block_size: int | None = None,
             backend: str = "auto") -> bytes:
    """Compress to the HRT1 container.

    The codec spec selects the HRT1 pipeline parameters (width transform,
    emission threshold, single-symbol mode -- see :func:`hrt1_params`), so
    different codec families produce genuinely different payloads.

    ``backend``: 'kernel' (Pallas block encoder, the flagship device path),
    'device' (jit XLA encode), 'native' (C++ host encoder), 'host' (numpy
    golden path) or 'auto' (native if available; else the Pallas kernel on
    TPU backends, else XLA).  All encoders emit identical commands.
    """
    cspec = _resolve(codec)
    w, bdef, min_count, single = hrt1_params(cspec)
    if block_size is None:
        block_size = bdef
    if block_size % w:
        raise ValueError(f"block_size {block_size} not divisible by the "
                         f"{w}-byte symbol width of {cspec.name!r}")
    arr = _as_bytes_array(data)
    if arr.size == 0:
        return container.serialize_blocks(
            cspec.index, 0, block_size, min_count,
            np.zeros((0, 1), np.uint8), np.zeros((0, 1), np.int32),
            np.zeros((0, 1), np.int32), np.zeros((0, block_size), np.uint8),
            np.zeros(0, np.int32), np.zeros(0, np.int32))
    x, lens = _to_blocks(arr, block_size)
    if w > 1 and backend in ("kernel", "device"):
        # width de-interleave on-device for the accelerator encoders (one
        # transpose per block); partial tail blocks are fixed up host-side
        nb_, B_ = x.shape
        xd = jax.jit(lambda a: a.reshape(nb_, B_ // w, w)
                     .swapaxes(1, 2).reshape(nb_, B_))(jnp.asarray(x))
        tl = (-(-lens.astype(np.int64) // w) * w).astype(np.int32)
        for b in np.flatnonzero(lens != B_):
            row, tb = _deinterleave_block(x[b], int(lens[b]), w)
            tl[b] = tb
            xd = xd.at[b].set(jnp.asarray(row))
        x, lens = xd, tl
    else:
        x, lens = _deinterleave(x, lens, w)
    only_sym = None
    if single:
        # dominant byte per block in one O(n) pass (the approximate-scan
        # analog of rle8_extreme_cpu.c:53-153): one flat bincount over
        # (block, byte) pairs, padding masked by weight
        nb_, B_ = x.shape
        flat = (np.arange(nb_, dtype=np.int64)[:, None] * 256
                + x.astype(np.int64))
        wt = (np.arange(B_)[None, :] < lens[:, None]).astype(np.float64)
        hist = np.bincount(flat.ravel(), weights=wt.ravel(),
                           minlength=nb_ * 256).reshape(nb_, 256)
        only_sym = hist.argmax(axis=1).astype(np.int32)
    cap = planar.capacity_for(block_size, min_count)
    cols = None
    if backend in ("auto", "native"):
        from .utils import native
        cols = native.planar_from_bytes(x, lens, cap, min_count,
                                        only_sym=only_sym)
        if cols is None and backend == "native":
            raise RuntimeError("native runtime unavailable")
    if cols is None and (backend == "kernel" or (
            backend == "auto" and jax.default_backend() == "tpu")):
        from .ops import encode_sup
        interp = jax.default_backend() != "tpu"
        cols = [np.asarray(v) for v in encode_sup.encode_blocks_kernel(
            jnp.asarray(x), jnp.asarray(lens), capacity=cap,
            min_count=min_count, interpret=interp,
            only_sym=None if only_sym is None else jnp.asarray(only_sym))]
    if cols is None and backend in ("auto", "device"):
        pb = device.encode_blocks(
            x, lens, capacity=cap, min_count=min_count,
            only_sym=None if only_sym is None else jnp.asarray(only_sym))
        cols = [np.asarray(v) for v in
                (pb.sym, pb.count, pb.lit_len, pb.lits, pb.n_cmds, pb.n_lits)]
    if cols is None:
        cols = _host_encode(x, lens, cap, block_size, min_count, only_sym)
    return container.serialize_blocks(
        cspec.index, arr.size, block_size, min_count, *cols)


def decompress(buf, *, backend: str = "auto") -> bytes:
    """Decompress an HRT1 container.

    ``backend``: 'kernel' (fused Pallas event decode -- the flagship device
    path, O(compressed) input), 'device' (XLA), 'host' (numpy), 'auto'
    (kernel on TPU backends, else XLA).
    """
    buf = bytes(buf)
    info, blocks = container.parse(buf)
    if info.uncompressed_size == 0:
        return b""
    try:
        w = hrt1_params(spec_mod.by_index(info.codec_index))[0]
    except (IndexError, KeyError):
        w = 1
    if info.block_size % w:
        raise container.ContainerError(
            f"block size {info.block_size} not divisible by codec "
            f"{info.codec_index}'s {w}-byte width")
    if backend == "auto":
        backend = "kernel" if jax.default_backend() == "tpu" else "device"

    orig_len = np.full(info.n_blocks, info.block_size, np.int32)
    orig_len[-1] = info.uncompressed_size - (info.n_blocks - 1) * info.block_size
    tlen = orig_len
    if w > 1:   # widths decode in the byte-lane domain (hrt1_params)
        tlen = (-(-orig_len.astype(np.int64) // w) * w).astype(np.int32)

    y = None
    interleaved = False
    if backend == "kernel":
        from .ops import decode_sup, unpack_device
        interp = jax.default_backend() != "tpu"
        cap_est = max((bl["n_cmds"] for bl in blocks), default=1)
        cap_est = -(-cap_est // 128) * 128
        # min_count >= 4 guarantees at most one run start and one run end
        # per output word -- the kernel's boundary-descriptor contract
        # (decode_sup module docstring); hostile containers advertising a
        # smaller min_count take the XLA decoder
        if info.min_count >= 4 and decode_sup.fits_kernel(
                info.block_size, cap_est):
            # O(compressed) device path: ship payload sections, bit-unpack
            # the command columns on-device (ops/unpack_device.py)
            pk = container.pack_for_device(buf, parsed=(info, blocks))
            if pk is not None:
                pk["block_len"] = tlen
                # one concatenated transfer per dtype + on-device slicing
                # (12 separate puts paid ~12 tunnel syncs; VERDICT r4)
                arrs = unpack_device.ship_packed(pk)
                try:
                    # width-1 codecs take the words form: the byte view
                    # of the int32 output is free on the host
                    yd, bad = unpack_device.dispatch_packed(
                        pk, arrs, interpret=interp, with_flags=True,
                        out_words=(w == 1 or w % 4 == 0))
                except Exception as exc:
                    # only genuine capacity limits may demote to XLA
                    # (extreme command densities can push the kernel past
                    # the chip's VMEM at large blocks); anything else --
                    # a Mosaic miscompile, a layout bug -- must surface,
                    # not silently detour (VERDICT r4 #5)
                    if not _is_resource_error(exc):
                        raise
                    global _kernel_fallbacks
                    _kernel_fallbacks += 1
                    yd = None
                if yd is not None and bad is not None and bool(
                        np.asarray(jnp.any(bad != 0))):
                    # hostile deep container: stored sub-header counts
                    # disagree with the escape population; re-route to the
                    # validating host reader, which raises ContainerError
                    yd = None
            else:
                yd = None
            if yd is not None:
                from .ops import decode_sup as _ds
                if w > 1:
                    # width re-interleave on-device, once per stream in
                    # HBM (rle24_extreme_cpu_decode.h:30-55's staggered
                    # broadcasts): word-domain shift/mask composition for
                    # w % 4 == 0 (no byte relayout), byte transpose for
                    # 16/24/48-bit; only partial tail blocks fall back to
                    # the host fix-up below
                    if w % 4 == 0:          # yd is [nb, B/4] words
                        nb_, B_ = yd.shape[0], yd.shape[1] * 4
                        yi = _ds.interleave_words(yd, w=w)
                        y = _ds.words_to_bytes(np.asarray(yi))
                        lane_bytes = None   # lazy: tail blocks only
                    else:
                        nb_, B_ = yd.shape
                        yi = _interleave_plane(yd, nb=nb_, w=w, B=B_)
                        y = np.array(yi)    # writable host copy
                        lane_bytes = None
                    for b in np.flatnonzero(orig_len != B_):
                        if lane_bytes is None:
                            lane_bytes = (_ds.words_to_bytes(np.asarray(yd))
                                          if w % 4 == 0 else np.asarray(yd))
                            if not y.flags.writeable:
                                y = y.copy()
                        n = int(orig_len[b])
                        y[b, :n] = _interleave_block(lane_bytes[b], n, w)
                    interleaved = True
                else:
                    y = _ds.words_to_bytes(np.asarray(yd))
        backend = "done" if y is not None else "device"  # XLA fallback

    info, planar_cols = (info, None) if y is not None else \
        container.deserialize_to_planar(buf)
    if planar_cols is not None:
        sym, count, lit_len, lits, n_cmds, n_lits, _bl = planar_cols
    block_len = tlen
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
    if w > 1 and not interleaved:
        nb, B = y.shape
        yi = np.ascontiguousarray(
            y.reshape(nb, w, B // w).swapaxes(1, 2).reshape(nb, B))
        for b in np.flatnonzero(orig_len != B):   # partial (tail) blocks
            n = int(orig_len[b])
            yi[b, :n] = _interleave_block(y[b], n, w)
        y = yi
    mask = np.arange(info.block_size)[None, :] < orig_len[:, None]
    return y[mask].tobytes()


def _host_encode(x, lens, cap, block_size, min_count, only_sym=None):
    outs = [planar.host_encode_block(
        x[b, :lens[b]], cap, block_size, min_count,
        None if only_sym is None else int(only_sym[b]))
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

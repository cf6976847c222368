#!/usr/bin/env python3
"""Benchmark harness: one JSON line on stdout with the headline metric.

Headline: 8-bit RLE block-parallel decode throughput on the accelerator,
vs the reference's published single-thread x86 number on video_frame.raw
(25,830.4 MiB/s decode, README.md:28 => 27.086 GB/s decimal).

The benchmark dataset is synthesized to match the reference dataset's
statistics (quantized video-frame DCTs: ~80% zeros in runs, small nonzero
coefficients; the real file is not redistributable).  The reference's own
numbers for this dataset put the 8-bit codec at a 19.34% ratio; the synthetic
stream is tuned to land in the same regime, and the achieved ratio is
reported on stderr for comparison.

Timing: the axon TPU platform's `block_until_ready` does not reliably block,
so every timed iteration forces completion by fetching a 1-element checksum
slice to the host; the fetch cost is measured and subtracted via a
zero-work calibration loop.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_DECODE_GBPS = 27.086   # 25830.4 MiB/s, README.md:28
BASELINE_ENCODE_GBPS = 3.481    # 3319.6 MiB/s, README.md:28


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dataset(mib: int, seed: int = 42) -> np.ndarray:
    """Quantized-DCT-like stream: zero runs + small coefficients."""
    n = mib << 20
    rng = np.random.default_rng(seed)
    vals = rng.integers(-6, 7, size=n, dtype=np.int8).astype(np.uint8)
    keep = rng.random(n) < 0.17
    return np.where(keep, vals, 0).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=64, help="dataset size (MiB)")
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.mib, args.iters = 8, 3

    import jax
    import jax.numpy as jnp
    from hypersonic_rle_kit_tpu.ops import device, planar
    from hypersonic_rle_kit_tpu.parallel import container

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    data = make_dataset(args.mib)
    n = data.size
    B = args.block
    nb = n // B
    x = data[: nb * B].reshape(nb, B)
    n = nb * B
    lens = np.full(nb, B, np.int32)
    cap = planar.capacity_for(B, 6)

    xd = jax.device_put(jnp.asarray(x))
    lend = jax.device_put(jnp.asarray(lens))

    @jax.jit
    def enc(xd, lend):
        return device.encode_blocks(xd, lend, capacity=cap, min_count=6)

    @jax.jit
    def dec(pb):
        y = device.decode_blocks(pb)
        return y, y[0, :1]          # tiny slice fetched to force completion

    @jax.jit
    def nop(xd):
        return xd[0, :1]

    # --- warmup / compile ---
    t0 = time.time()
    pb = enc(xd, lend)
    _ = np.asarray(pb.n_cmds[:1])
    log(f"encode compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    y, chk = dec(pb)
    _ = np.asarray(chk)
    log(f"decode compile+run: {time.time()-t0:.1f}s")

    # --- calibration: fetch overhead ---
    t0 = time.time()
    for _ in range(4):
        _ = np.asarray(nop(xd))
    fetch_overhead = (time.time() - t0) / 4
    log(f"fetch overhead: {fetch_overhead*1e3:.2f} ms")

    # --- correctness (device-side compare, scalar fetch) ---
    @jax.jit
    def check(pb, xd):
        y = device.decode_blocks(pb)
        return jnp.all(y == xd)
    ok = bool(np.asarray(check(pb, xd)))
    log(f"roundtrip on device: {ok}")

    # --- encode timing ---
    times = []
    for _ in range(max(3, args.iters // 2)):
        t0 = time.time()
        pb2 = enc(xd, lend)
        _ = np.asarray(pb2.n_cmds[:1])
        times.append(time.time() - t0 - fetch_overhead)
    enc_t = float(np.median(times))
    enc_gbps = n / enc_t / 1e9
    log(f"encode: {enc_t*1e3:.2f} ms = {enc_gbps:.2f} GB/s "
        f"(vs ref {BASELINE_ENCODE_GBPS} GB/s)")

    # --- decode timing ---
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        y, chk = dec(pb)
        _ = np.asarray(chk)
        times.append(time.time() - t0 - fetch_overhead)
    dec_t = float(np.median(times))
    dec_gbps = n / dec_t / 1e9
    log(f"decode: {dec_t*1e3:.2f} ms = {dec_gbps:.2f} GB/s "
        f"(vs ref {BASELINE_DECODE_GBPS} GB/s)")

    # --- compressed ratio via container serialization ---
    cols = [np.asarray(v) for v in
            (pb.sym, pb.count, pb.lit_len, pb.lits, pb.n_cmds, pb.n_lits)]
    blob = container.serialize_blocks(0, n, B, 6, *cols)
    ratio = len(blob) / n
    log(f"HRT1 ratio: {100*ratio:.2f}% (ref 8-bit on video_frame.raw: 19.34%)")

    if not ok:
        log("ROUNDTRIP FAILED — reporting 0")
        dec_gbps = 0.0

    print(json.dumps({
        "metric": "rle8_block_decode_throughput",
        "value": round(dec_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(dec_gbps / BASELINE_DECODE_GBPS, 4),
    }))


if __name__ == "__main__":
    main()
